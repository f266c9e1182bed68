"""Fit per-event weights flattening the energy spectrum
(mirror of reference ``examples/03_weights/01_fit_uniform_weights.py``)."""

import shutil
import tempfile

import numpy as np

from graphnet_tpu.constants import EXAMPLE_SQLITE_DATA
from graphnet_tpu.training.weight_fitting import Uniform


def main() -> None:
    # work on a copy — weights are written back as a new table
    tmp = tempfile.mktemp(suffix=".db")
    shutil.copy(EXAMPLE_SQLITE_DATA, tmp)

    fitter = Uniform(tmp, truth_table="mc_truth")
    weights = fitter.fit(
        bins=np.arange(0, 5, 0.1),
        variable="injection_energy",
        transform=np.log10,
        add_to_database=True,
    )
    print(weights.head())
    print(f"weights written to table {fitter._weight_name!r} in {tmp}")


if __name__ == "__main__":
    main()
