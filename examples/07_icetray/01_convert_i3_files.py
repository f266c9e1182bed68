"""Convert IceTray ``.i3`` files to the intermediate format (mirror of
reference ``examples/01_icetray/01_convert_i3_files.py``).

Requires the proprietary IceCube software stack (icetray) at runtime —
import-guarded exactly like the reference (``utilities/imports.py:9-21``);
without it the script explains and exits cleanly so the example harness
stays green.
"""

from graphnet_tpu.utils.argparse import ArgumentParser
from graphnet_tpu.utils.imports import has_icecube_package


def main() -> None:
    parser = ArgumentParser(
        description="Convert I3 files to SQLite or Parquet"
    )
    parser.add_argument("backend", nargs="?", default="sqlite",
                        choices=["sqlite", "parquet"])
    parser.add_argument("--input-dir", default=None)
    parser.add_argument("--gcd-rescue", default=None)
    parser.add_argument("--outdir", default="/tmp/i3_converted")
    parser.add_argument("--num-workers", type=int, default=1)
    args = parser.parse_args()

    if not has_icecube_package():
        print(
            "icetray is not installed — this example needs the IceCube "
            "software stack to decode .i3 files.\n"
            "The conversion pipeline it drives "
            "(I3ToSQLiteConverter/I3ToParquetConverter, I3Reader, "
            "I3FeatureExtractor*, I3TruthExtractor) is fully wired; see "
            "graphnet_tpu/data/pre_configured.py and "
            "tests/test_i3reader.py for the IceTray-free logic tests."
        )
        return
    assert args.input_dir and args.gcd_rescue, (
        "--input-dir and --gcd-rescue are required"
    )

    from graphnet_tpu.data.extractors.icecube import (
        I3FeatureExtractorIceCube86,
        I3TruthExtractor,
    )
    from graphnet_tpu.data.pre_configured import (
        I3ToParquetConverter,
        I3ToSQLiteConverter,
    )

    cls = (
        I3ToSQLiteConverter
        if args.backend == "sqlite"
        else I3ToParquetConverter
    )
    converter = cls(
        gcd_rescue=args.gcd_rescue,
        extractors=[
            I3FeatureExtractorIceCube86("SRTInIcePulses"),
            I3TruthExtractor(),
        ],
        outdir=args.outdir,
        num_workers=args.num_workers,
    )
    converter(args.input_dir)
    converter.merge_files()
    print(f"converted to {args.outdir}")


if __name__ == "__main__":
    main()
