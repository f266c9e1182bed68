"""Fit BjoernLow per-event weights: uniform spectrum below a threshold,
``1/(1 + alpha (x - x_low))`` falloff above (mirror of reference
``examples/03_weights/02_fit_bjoern_low_weights.py``)."""

import shutil
import tempfile

import numpy as np

from graphnet_tpu.constants import EXAMPLE_SQLITE_DATA
from graphnet_tpu.training.weight_fitting import BjoernLow


def main() -> None:
    tmp = tempfile.mktemp(suffix=".db")
    shutil.copy(EXAMPLE_SQLITE_DATA, tmp)

    fitter = BjoernLow(tmp, truth_table="mc_truth")
    weights = fitter.fit(
        bins=np.arange(0, 5, 0.1),
        variable="injection_energy",
        transform=np.log10,
        x_low=1.5,
        alpha=0.05,
        add_to_database=True,
        weight_name="bjoern_low_weight",
    )
    print(weights.head())


if __name__ == "__main__":
    main()
