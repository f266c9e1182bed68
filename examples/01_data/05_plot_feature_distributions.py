"""Plot per-feature distributions of a configured Dataset (mirror of
reference ``examples/02_data/02_plot_feature_distributions.py``).

Loads the bundled dataset through the dataset-config round-trip, stacks
the preprocessed (detector-standardised) node features of every event,
reports NaN/inf counts, and writes one log-scale histogram per feature.
"""

import argparse
import os

import matplotlib

matplotlib.use("Agg")  # headless
import matplotlib.pyplot as plt
import numpy as np

from graphnet_tpu.constants import CONFIG_DIR
from graphnet_tpu.utils.config import load_dataset
from graphnet_tpu.utils.logging import Logger


def main(output: str) -> None:
    logger = Logger()
    dataset = load_dataset(
        os.path.join(
            CONFIG_DIR, "datasets", "training_example_data_sqlite.yml"
        )
    )
    if isinstance(dataset, dict):  # {selection name: Dataset}
        name, dataset = sorted(dataset.items())[0]
        logger.info(f"using selection {name!r}")

    features = dataset._features
    x = np.concatenate(
        [np.asarray(dataset[i].x) for i in range(len(dataset))], axis=0
    )
    logger.info(f"feature matrix: {x.shape}")
    logger.info(f"Number of NaNs: {int(np.sum(np.isnan(x)))}")
    logger.info(f"Number of infs: {int(np.sum(np.isinf(x)))}")

    nb = x.shape[1]
    dim = int(np.ceil(np.sqrt(nb)))
    fig, axes = plt.subplots(dim, dim, figsize=(dim * 4, dim * 4))
    for ix, ax in enumerate(np.ravel(axes)[:nb]):
        ax.hist(x[:, ix], bins=50, color="orange")
        ax.set_xlabel(
            f"x{ix}: {features[ix] if ix < len(features) else 'N/A'}"
        )
        ax.set_yscale("log")
    fig.tight_layout()
    fig.savefig(output)
    logger.info(f"Figure written to {output}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description="Plot feature distributions in the example dataset."
    )
    parser.add_argument(
        "--output",
        default="/tmp/feature_distribution_preprocessed.png",
    )
    args = parser.parse_args()
    main(args.output)
