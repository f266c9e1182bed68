"""Deploy a trained model inside an I3Tray chain (mirror of reference
``examples/01_icetray/03_i3_deployer_example.py``).

Wires ``I3InferenceModule`` + ``I3Deployer`` against the translated QUESO
zoo config.  Requires the proprietary IceCube software stack (icetray) at
runtime — import-guarded exactly like the reference; without it the script
explains and exits cleanly so the example harness stays green.
"""

import os
from glob import glob

from graphnet_tpu.constants import PRETRAINED_MODEL_DIR
from graphnet_tpu.utils.argparse import ArgumentParser
from graphnet_tpu.utils.imports import has_icecube_package


def main() -> None:
    parser = ArgumentParser(
        description="Run model inference over .i3 files via I3Tray"
    )
    parser.add_argument("--input-dir", default=None)
    parser.add_argument("--gcd-file", default=None)
    parser.add_argument(
        "--state-dict",
        default=None,
        help="ported flax params (.pkl) for the zoo config — see "
        "graphnet_tpu.utils.weight_port for the torch->flax porter",
    )
    parser.add_argument("--pulsemap", default="SplitInIcePulses")
    args = parser.parse_args()

    base = os.path.join(PRETRAINED_MODEL_DIR, "queso", "total_neutrino_energy")
    model_config = os.path.join(base, "model.yml")
    print(f"zoo config: {model_config}")

    if not has_icecube_package():
        print(
            "icetray is not installed — this example needs the IceCube "
            "software stack to read .i3 frames.\n"
            "The deployment chain it drives (I3InferenceModule -> "
            "I3Deployer -> I3Tray Reader/Writer) is fully wired; see "
            "graphnet_tpu/deployment/icecube.py and tests/test_deployment.py "
            "for the IceTray-free serving path."
        )
        return

    assert args.input_dir and args.gcd_file and args.state_dict, (
        "--input-dir, --gcd-file and --state-dict are required"
    )

    from graphnet_tpu.data.constants import FEATURES
    from graphnet_tpu.data.extractors.icecube import (
        I3FeatureExtractorIceCubeUpgrade,
    )
    from graphnet_tpu.deployment.icecube import (
        I3Deployer,
        I3InferenceModule,
    )
    from graphnet_tpu.utils.config import load_model

    module = I3InferenceModule(
        pulsemap_extractor=I3FeatureExtractorIceCubeUpgrade(
            pulsemap=args.pulsemap
        ),
        model_config=model_config,
        state_dict=args.state_dict,
        gcd_file=args.gcd_file,
        prediction_columns=["energy"],
        model_name="graphnet_tpu_deployment_example",
    )
    model = load_model(model_config)
    module.set_graph_definition(model.graph_definition)

    deployer = I3Deployer(
        modules=[module], gcd_file=args.gcd_file, n_workers=1
    )
    input_files = sorted(glob(os.path.join(args.input_dir, "*.i3*")))
    deployer.run(input_files)


if __name__ == "__main__":
    main()
