"""The nilearn surface-rendering branch of viz/plotting.py.

nilearn is optional (reference: ``plotting.py:155-261`` renders on
fsaverage). When it is installed the real path runs; in this image it is
not, so the branch is exercised with injected fakes that verify the
atlas-label lookup, ROI-map construction and the surface-render call
pattern — the degraded fallback is no longer the only tested branch.
"""

import types

import numpy as np
import pytest

from multivae_tpu.viz import plotting as vp


@pytest.fixture()
def fake_nilearn(monkeypatch):
    calls = []
    atlas = {
        "labels": [b"bg", b"G_front_and_sup", b"S_calc"],
        "map_left": np.array([0, 1, 2, 1, 0]),
        "map_right": np.array([2, 1, 0]),
    }
    fsavg = {f"{t}_{h}": np.zeros(3)
             for t in ("infl", "pial", "sulc") for h in ("left", "right")}
    fake_ds = types.SimpleNamespace(
        fetch_atlas_surf_destrieux=lambda: atlas,
        fetch_surf_fsaverage=lambda: fsavg)

    def record(name):
        def fn(*args, **kwargs):
            calls.append((name, kwargs.get("hemi"), kwargs.get("view")))
        return fn

    fake_pl = types.SimpleNamespace(
        plot_surf_roi=record("roi"),
        plot_surf_stat_map=record("stat"))
    monkeypatch.setattr(vp, "nl_datasets", fake_ds, raising=False)
    monkeypatch.setattr(vp, "nl_plotting", fake_pl, raising=False)
    monkeypatch.setattr(vp, "HAS_NILEARN", True)
    return calls


class TestNilearnBranch:
    def test_plot_areas_renders_four_views(self, fake_nilearn, tmp_path):
        out = tmp_path / "areas.png"
        # destrieux label "G_front_and_sup" -> feature "G_front&sup_lh"
        fig = vp.plot_areas(["G_front&sup_lh", "S_calc_rh"],
                            np.array([1.0, 2.0]), save_path=str(out))
        assert out.exists()
        assert fig is not None
        # 2 hemispheres x (lateral, medial)
        assert sorted(fake_nilearn) == sorted(
            [("roi", "left", "lateral"), ("roi", "left", "medial"),
             ("roi", "right", "lateral"), ("roi", "right", "medial")])

    def test_plot_areas_unknown_roi_raises(self, fake_nilearn, tmp_path):
        with pytest.raises(ValueError):
            vp.plot_areas(["nonexistent_lh"], np.array([1.0]),
                          save_path=str(tmp_path / "x.png"))

    def test_plot_surf_mosaic_roi_maps(self, fake_nilearn, tmp_path):
        out = tmp_path / "mosaic.png"
        textures = [np.zeros(5), np.zeros(3)]
        vp.plot_surf_mosaic([textures], ["score_0"], str(out), label=True)
        assert out.exists()
        assert len(fake_nilearn) == 4
        assert all(name == "roi" for name, _, _ in fake_nilearn)

    def test_plot_surf_mosaic_stat_maps(self, fake_nilearn, tmp_path):
        out = tmp_path / "mosaic_stat.png"
        textures = [np.zeros(5), np.zeros(3)]
        vp.plot_surf_mosaic([textures], ["score_0"], str(out), label=False)
        assert out.exists()
        assert len(fake_nilearn) == 4
        assert all(name == "stat" for name, _, _ in fake_nilearn)


@pytest.mark.skipif(not vp.HAS_NILEARN,
                    reason="nilearn not installed in this image")
class TestRealNilearn:  # pragma: no cover - runs only where nilearn exists
    def test_plot_areas_real(self, tmp_path):
        out = tmp_path / "areas_real.png"
        vp.plot_areas(["G_precentral_lh"], np.array([1.0]),
                      save_path=str(out))
        assert out.exists()


class TestParcats:
    """Parallel-categories flow renderer (the plotly-Parcats equivalent)."""

    def test_renders_and_conserves_flow(self, tmp_path):
        flows = [(0, 0, 0.8, "#c0392b"), (0, 1, 0.4, "#2980b9"),
                 (1, 1, 0.5, "#c0392b"), (2, 0, 0.3, "#2980b9"),
                 (2, 2, 0.9, "#c0392b")]
        path = str(tmp_path / "parcats.png")
        fig = vp.plot_parcats(flows, ["s0", "s1", "s2"],
                              ["r0", "r1", "r2"], save_path=path)
        import os
        assert os.path.getsize(path) > 5000
        # every flow is drawn as one band patch + 6 node bars
        import matplotlib.patches as mp
        bands = [p for p in fig.axes[0].patches
                 if isinstance(p, mp.PathPatch)]
        assert len(bands) == len(flows)

    def test_skips_empty_nodes(self, tmp_path):
        # a label with zero flow gets no bar and no crash
        flows = [(0, 1, 1.0, "red")]
        fig = vp.plot_parcats(flows, ["a", "b"], ["x", "y"],
                              save_path=str(tmp_path / "p.png"))
        assert fig is not None


class TestMjpegAvi:
    """The hand-muxed Motion-JPEG AVI (viz/video.py) — the ffmpeg-free
    equivalent of the reference's mp4 animation (workflow.py:1242-1373)."""

    def _parse_riff(self, data):
        assert data[:4] == b"RIFF" and data[8:12] == b"AVI "
        import struct
        total = struct.unpack("<I", data[4:8])[0]
        assert total == len(data) - 8
        chunks, off = {}, 12
        while off < len(data):
            fourcc = data[off:off + 4]
            size = struct.unpack("<I", data[off + 4:off + 8])[0]
            body = data[off + 8:off + 8 + size]
            key = (fourcc if fourcc != b"LIST" else body[:4]).decode()
            chunks.setdefault(key, []).append(body)
            off += 8 + size + (size % 2)
        return chunks

    def test_container_structure_and_payloads(self, tmp_path):
        import io
        import struct

        from PIL import Image

        from multivae_tpu.viz.video import write_mjpeg_avi

        rng = np.random.default_rng(0)
        frames = [rng.integers(0, 255, (32, 48, 3)).astype(np.uint8)
                  for _ in range(5)]
        path = write_mjpeg_avi(str(tmp_path / "clip.avi"), frames, fps=4)
        data = open(path, "rb").read()
        chunks = self._parse_riff(data)
        assert set(chunks) >= {"hdrl", "movi", "idx1"}
        hdrl = chunks["hdrl"][0]
        assert hdrl[4:8] == b"avih"
        n, _, streams, _, w, h = struct.unpack("<6I", hdrl[12 + 16:12 + 40])
        assert (n, streams, w, h) == (5, 1, 48, 32)
        assert b"MJPG" in hdrl
        movi = chunks["movi"][0]
        # every frame chunk is a decodable JPEG of the right size
        off, decoded = 4, 0
        while off < len(movi):
            assert movi[off:off + 4] == b"00dc"
            size = struct.unpack("<I", movi[off + 4:off + 8])[0]
            jpeg = movi[off + 8:off + 8 + size]
            img = Image.open(io.BytesIO(jpeg))
            assert img.size == (48, 32)
            decoded += 1
            off += 8 + size + (size % 2)
        assert decoded == 5
        # idx1 entries point at the actual chunk positions
        idx = chunks["idx1"][0]
        assert len(idx) == 5 * 16
        first_off = struct.unpack("<I", idx[8:12])[0]
        assert movi[first_off:first_off + 4] == b"00dc"

    def test_rejects_mismatched_frames(self, tmp_path):
        from multivae_tpu.viz.video import write_mjpeg_avi

        good = np.zeros((8, 8, 3), np.uint8)
        bad = np.zeros((8, 9, 3), np.uint8)
        with pytest.raises(ValueError, match="every frame"):
            write_mjpeg_avi(str(tmp_path / "x.avi"), [good, bad])
        with pytest.raises(ValueError, match="at least one"):
            write_mjpeg_avi(str(tmp_path / "y.avi"), [])
