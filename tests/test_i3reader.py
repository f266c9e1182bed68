"""I3Reader non-IceTray logic: file pairing, filter composition, frame
skipping — unit-tested with fakes (VERDICT r1 item 4; reference behavior at
``data/readers/i3reader.py:68-143``, ``utilities/filesys.py:33-100``,
``.../utilities/i3_filters.py``)."""

import os

import pytest

from graphnet_tpu.data.filesys import find_i3_files, is_gcd_file, is_i3_file
from graphnet_tpu.data.i3_filters import (
    I3Filter,
    I3FilterMask,
    NullSplitI3Filter,
    SubEventStreamI3Filter,
)
from graphnet_tpu.data.readers.i3reader import I3FileSet, I3Reader


# --- fakes -----------------------------------------------------------------


class FakeHeader:
    def __init__(self, stream):
        self.sub_event_stream = stream


class FakeMaskEntry:
    def __init__(self, passed):
        self.condition_passed = passed


class FakeFrame:
    """Duck-typed icetray.I3Frame: Has(), `in`, and [] access."""

    def __init__(self, items=None):
        self._items = items or {}

    def Has(self, key):
        return key in self._items

    def __contains__(self, key):
        return key in self._items

    def __getitem__(self, key):
        return self._items[key]


def physics_frame(stream="InIceSplit", filters=None):
    items = {"I3EventHeader": FakeHeader(stream)}
    if filters is not None:
        items["FilterMask"] = {
            k: FakeMaskEntry(v) for k, v in filters.items()
        }
    return FakeFrame(items)


# --- filesystem pairing ----------------------------------------------------


class TestI3FileDiscovery:
    def test_is_gcd_and_i3(self):
        assert is_gcd_file("GeoCalibDetectorStatus_2020.i3.gz")
        assert is_gcd_file("somefile_gcd.i3.zst")
        assert not is_i3_file("somefile_gcd.i3.zst")
        assert is_i3_file("oscNext_genie_run1.i3.bz2")
        assert not is_i3_file("readme.txt")

    def _tree(self, tmp_path):
        a = tmp_path / "setA"
        b = tmp_path / "setB"
        a.mkdir()
        b.mkdir()
        for name in ("run1.i3.bz2", "run2.i3.zst"):
            (a / name).write_bytes(b"x")
        (a / "GeoCalibDetectorStatus_A.i3.gz").write_bytes(b"g")
        (b / "run3.i3.gz").write_bytes(b"x")  # no GCD in this folder
        rescue = tmp_path / "rescue_gcd.i3.gz"
        rescue.write_bytes(b"g")
        return str(tmp_path), str(rescue), str(a), str(b)

    def test_pairing_with_rescue(self, tmp_path):
        root, rescue, a, b = self._tree(tmp_path)
        i3s, gcds = find_i3_files(root, gcd_rescue=rescue)
        assert len(i3s) == len(gcds) == 3
        pairs = dict(zip(map(os.path.basename, i3s), gcds))
        assert pairs["run1.i3.bz2"].endswith("GeoCalibDetectorStatus_A.i3.gz")
        assert pairs["run2.i3.zst"].endswith("GeoCalibDetectorStatus_A.i3.gz")
        assert pairs["run3.i3.gz"] == rescue

    def test_missing_rescue_raises(self, tmp_path):
        root, rescue, a, b = self._tree(tmp_path)
        with pytest.raises(RuntimeError, match="no GCD"):
            find_i3_files(b, gcd_rescue=None)

    def test_reader_find_files(self, tmp_path):
        root, rescue, a, b = self._tree(tmp_path)
        reader = I3Reader(gcd_rescue=rescue)
        filesets = reader.find_files(root)
        assert all(isinstance(fs, I3FileSet) for fs in filesets)
        assert len(filesets) == 3
        assert all(is_i3_file(fs.i3_file) for fs in filesets)
        assert all(is_gcd_file(fs.gcd_file) for fs in filesets)


# --- filters ---------------------------------------------------------------


class TestFilters:
    def test_null_split(self):
        f = NullSplitI3Filter()
        assert f(physics_frame("InIceSplit"))
        assert not f(physics_frame("NullSplit"))
        assert f(FakeFrame())  # no header: kept

    def test_sub_event_stream(self):
        f = SubEventStreamI3Filter(["InIceSplit"])
        assert f(physics_frame("InIceSplit"))
        assert not f(physics_frame("SomethingElse"))

    def test_filter_mask_any_vs_all(self):
        any_f = I3FilterMask(["MuonFilter", "CascadeFilter"], filter_any=True)
        all_f = I3FilterMask(["MuonFilter", "CascadeFilter"], filter_any=False)
        fr = physics_frame(filters={"MuonFilter": True, "CascadeFilter": False})
        assert any_f(fr)
        assert not all_f(fr)
        fr2 = physics_frame(filters={"MuonFilter": True, "CascadeFilter": True})
        assert all_f(fr2)

    def test_filter_mask_missing_entries_kept(self):
        f = I3FilterMask(["NotThere"])
        assert f(physics_frame(filters={"MuonFilter": True}))
        assert f(physics_frame())  # no FilterMask at all

    def test_bad_filter_return_type(self):
        class Bad(I3Filter):
            def _keep_frame(self, frame):
                return 1

        with pytest.raises(TypeError):
            Bad()(FakeFrame())


# --- reader skip logic -----------------------------------------------------


class TestReaderSkip:
    def test_default_filter_is_nullsplit(self, tmp_path):
        rescue = tmp_path / "gcd.i3.gz"
        rescue.write_bytes(b"g")
        reader = I3Reader(gcd_rescue=str(rescue))
        assert reader._skip_frame(physics_frame("NullSplit"))
        assert not reader._skip_frame(physics_frame("InIceSplit"))

    def test_filter_composition_any_reject_skips(self, tmp_path):
        rescue = tmp_path / "gcd.i3.gz"
        rescue.write_bytes(b"g")
        reader = I3Reader(
            gcd_rescue=str(rescue),
            i3_filters=[
                NullSplitI3Filter(),
                SubEventStreamI3Filter(["InIceSplit"]),
            ],
        )
        assert not reader._skip_frame(physics_frame("InIceSplit"))
        assert reader._skip_frame(physics_frame("OtherSplit"))


# --- pre-configured converters import --------------------------------------


def test_i3_converters_constructible_without_icetray(tmp_path):
    """The converter classes exist and build their pipeline; only actually
    reading .i3 files needs IceTray."""
    from graphnet_tpu.data.extractors.icecube import I3PISAExtractor
    from graphnet_tpu.data.pre_configured import (
        I3ToParquetConverter,
        I3ToSQLiteConverter,
    )

    rescue = tmp_path / "gcd.i3.gz"
    rescue.write_bytes(b"g")
    for cls in (I3ToSQLiteConverter, I3ToParquetConverter):
        conv = cls(
            gcd_rescue=str(rescue),
            extractors=[I3PISAExtractor()],
            outdir=str(tmp_path / "out"),
        )
        assert conv._file_reader.extractor_names == ["pisa_dependencies"]


def test_niche_extractors_on_fake_frames():
    from graphnet_tpu.data.extractors.icecube import (
        I3FeatureExtractorIceCubeUpgrade,
        I3GalacticPlaneHybridRecoExtractor,
        I3NTMuonLabelExtractor,
        I3PISAExtractor,
        I3PulseNoiseTruthFlagIceCubeUpgrade,
    )

    # noise-truth-flag variant: constructible without icetray, extends the
    # Upgrade feature extractor (pulse decoding itself needs IceTray)
    flag = I3PulseNoiseTruthFlagIceCubeUpgrade("SplitInIcePulses")
    assert isinstance(flag, I3FeatureExtractorIceCubeUpgrade)
    assert flag._pulsemap == "SplitInIcePulses"

    pisa = I3PISAExtractor()
    out = pisa(FakeFrame({"I3MCWeightDict": {"OneWeight": 2.5}}))
    assert out["OneWeight"] == 2.5
    assert out["NEvents"] == -1.0  # padded

    class Val:
        def __init__(self, v):
            self.value = v

    nt = I3NTMuonLabelExtractor()
    out = nt(FakeFrame({"classification": Val(3)}))
    assert out["classification"] == 3
    assert out["coincident_muons"] == -1

    hyb = I3GalacticPlaneHybridRecoExtractor()
    assert hyb(FakeFrame()) == {}
    reco = {k: float(i) for i, k in enumerate(
        list(hyb._KEYS) + ["zen", "azi", "logE"]
    )}
    out = hyb(FakeFrame({"DNNCascadeAnalysis_version_001_p00": reco}))
    assert out["zenith_hybrid"] == reco["zen"]
    assert out["energy_hybrid_log"] == reco["logE"]


def test_frame_mc_and_noise_helpers():
    from graphnet_tpu.data.extractors.icecube import (
        frame_is_montecarlo,
        frame_is_noise,
    )

    class Particle:
        energy = 10.0

    mc = FakeFrame({"I3MCTree": [Particle()]})
    assert frame_is_montecarlo(mc)
    assert not frame_is_noise(mc)

    data = FakeFrame({})
    assert not frame_is_montecarlo(data)
    assert frame_is_noise(data)

    # MCTree present but empty (noise sim): montecarlo yet noise
    noise = FakeFrame({"I3MCTree": []})
    assert frame_is_montecarlo(noise)
    assert frame_is_noise(noise)


def test_has_extension_and_pairwise_shuffle():
    from graphnet_tpu.data.filesys import has_extension, pairwise_shuffle

    assert has_extension("run1.i3.bz2", ["bz2", "zst", "gz"])
    assert not has_extension("run1.i3.txt", ["bz2", "zst", "gz"])

    i3 = [f"f{i}.i3.gz" for i in range(10)]
    gcd = [f"g{i}.i3.gz" for i in range(10)]
    i3s, gcds = pairwise_shuffle(i3, gcd, seed=7)
    assert sorted(i3s) == sorted(i3)
    # pairing preserved
    for a, b in zip(i3s, gcds):
        assert a[1:] == b[1:]
    assert i3s != i3  # actually shuffled at this seed
