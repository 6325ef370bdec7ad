"""Surface-atlas rendering (viz/surface.py): the nilearn-free true-3D
equivalent of the reference's fsaverage plots (plotting.py:155-196,
:206-261). Pure matplotlib + numpy — no jax involved."""

import os

import matplotlib

matplotlib.use("Agg")

import numpy as np
import pytest

from multivae_tpu.viz.surface import (
    ATLAS_ENV_VAR,
    SurfaceAtlas,
    _face_colors,
    plot_areas_on_atlas,
    plot_mosaic_on_atlas,
    plot_roi_values,
    resolve_atlas,
)


@pytest.fixture(scope="module")
def atlas():
    return SurfaceAtlas.synthetic(n_rois=8, subdiv=2, seed=0)


class TestSyntheticAtlas:
    def test_mesh_invariants(self, atlas):
        for hemi in ("left", "right"):
            verts = atlas.vertices[hemi]
            faces = atlas.faces[hemi]
            labels = atlas.labels[hemi]
            assert verts.ndim == 2 and verts.shape[1] == 3
            assert faces.min() >= 0 and faces.max() < len(verts)
            assert labels.shape == (len(verts),)
        # hemispheres sit on opposite sides of the midline
        assert atlas.vertices["left"][:, 0].max() < 0
        assert atlas.vertices["right"][:, 0].min() > 0

    def test_every_roi_has_vertices(self, atlas):
        seen = set(atlas.labels["left"].tolist())
        seen |= set(atlas.labels["right"].tolist())
        assert seen == set(range(len(atlas.roi_names)))

    def test_custom_roi_names_split_across_hemispheres(self):
        names = [f"roi{i:03d}" for i in range(5)]
        atl = SurfaceAtlas.synthetic(roi_names=names, subdiv=1)
        assert atl.roi_names == names
        left_ids = set(atl.labels["left"].tolist())
        right_ids = set(atl.labels["right"].tolist())
        assert left_ids == {0, 1, 2} and right_ids == {3, 4}

    def test_deterministic(self):
        a = SurfaceAtlas.synthetic(n_rois=4, subdiv=1, seed=3)
        b = SurfaceAtlas.synthetic(n_rois=4, subdiv=1, seed=3)
        np.testing.assert_array_equal(a.labels["left"], b.labels["left"])
        np.testing.assert_allclose(a.vertices["right"], b.vertices["right"])

    def test_save_load_roundtrip(self, atlas, tmp_path):
        path = str(tmp_path / "atlas.npz")
        atlas.save(path)
        again = SurfaceAtlas.load(path)
        assert again.roi_names == atlas.roi_names
        for hemi in ("left", "right"):
            np.testing.assert_allclose(again.vertices[hemi],
                                       atlas.vertices[hemi])
            np.testing.assert_array_equal(again.faces[hemi],
                                          atlas.faces[hemi])
            np.testing.assert_array_equal(again.labels[hemi],
                                          atlas.labels[hemi])


class TestResolve:
    def test_instance_passthrough(self, atlas):
        assert resolve_atlas(atlas) is atlas

    def test_path_and_env(self, atlas, tmp_path, monkeypatch):
        path = str(tmp_path / "a.npz")
        atlas.save(path)
        assert resolve_atlas(path).roi_names == atlas.roi_names
        # pathlib.Path works too (os.PathLike)
        assert resolve_atlas(tmp_path / "a.npz").roi_names == atlas.roi_names
        monkeypatch.setenv(ATLAS_ENV_VAR, path)
        assert resolve_atlas(None).roi_names == atlas.roi_names
        monkeypatch.delenv(ATLAS_ENV_VAR)
        assert resolve_atlas(None) is None

    def test_missing_or_corrupt_atlas_degrades_to_none(
            self, atlas, tmp_path, monkeypatch, capsys):
        """A stale MULTIVAE_SURFACE_ATLAS (missing file, corrupt npz, wrong
        arrays) must degrade to None with an error message, not abort the
        workflow after its expensive compute."""
        monkeypatch.setenv(ATLAS_ENV_VAR, str(tmp_path / "gone.npz"))
        assert resolve_atlas(None) is None
        corrupt = tmp_path / "corrupt.npz"
        corrupt.write_bytes(b"not a zip archive")
        assert resolve_atlas(str(corrupt)) is None
        # wrong arrays: a valid npz missing the atlas keys
        wrong = tmp_path / "wrong.npz"
        np.savez(wrong, foo=np.zeros(3))
        assert resolve_atlas(str(wrong)) is None
        assert "failed to load" in capsys.readouterr().out

    def test_npz_loads_without_pickle(self, atlas, tmp_path):
        """The atlas file must stay loadable with numpy's safe default
        (allow_pickle=False) so shared files are not a pickle vector."""
        path = str(tmp_path / "a.npz")
        atlas.save(path)
        with np.load(path) as data:  # default allow_pickle=False
            names = [str(n) for n in data["roi_names"]]
        assert names == atlas.roi_names

    def test_out_of_range_labels_rejected(self, atlas):
        labels = {h: atlas.labels[h].copy() for h in ("left", "right")}
        labels["left"][0] = len(atlas.roi_names)  # out of range
        with pytest.raises(ValueError, match="labels reference ROI"):
            SurfaceAtlas(vertices=atlas.vertices, faces=atlas.faces,
                         labels=labels, roi_names=atlas.roi_names)


class TestRendering:
    def test_face_colors_mark_roi_not_background(self, atlas):
        name = atlas.roi_names[0]
        vv = atlas.vertex_values({name: 1.0})
        rgba = _face_colors(atlas, vv["left"], "left",
                            matplotlib.colormaps["jet"], 0.0, 1.0)
        labeled = np.unique(
            rgba[atlas.labels["left"][atlas.faces["left"]].max(1) == 0],
            axis=0)
        background = rgba[(atlas.labels["left"]
                           [atlas.faces["left"]] != 0).all(1)]
        # value 1.0 under jet -> red-ish; background -> gray
        assert (labeled[:, 0] > 0.4).all()
        assert np.allclose(background[:, :3],
                           background[:, :1], atol=1e-6)  # r == g == b

    def test_plot_roi_values_writes_four_views(self, atlas, tmp_path):
        out = str(tmp_path / "vals.png")
        fig = plot_roi_values(atlas, {atlas.roi_names[1]: 2.0,
                                      atlas.roi_names[-1]: -2.0},
                              save_path=out)
        assert os.path.isfile(out) and os.path.getsize(out) > 0
        assert len(fig.axes) == 4
        assert all(ax.name == "3d" for ax in fig.axes)
        matplotlib.pyplot.close(fig)

    def test_plot_areas_on_atlas(self, atlas, tmp_path):
        out = str(tmp_path / "areas.png")
        fig = plot_areas_on_atlas(atlas, [atlas.roi_names[0],
                                          atlas.roi_names[3]],
                                  np.array([0.01, 1.01]), save_path=out)
        assert os.path.isfile(out)
        matplotlib.pyplot.close(fig)

    def test_unknown_roi_raises(self, atlas):
        with pytest.raises(ValueError, match="not in surface atlas"):
            plot_roi_values(atlas, {"nonexistent": 1.0})

    def test_fig_without_row_raises(self, atlas):
        import matplotlib.pyplot as plt

        fig = plt.figure()
        with pytest.raises(ValueError, match="row="):
            plot_roi_values(atlas, {atlas.roi_names[0]: 1.0}, fig=fig)
        plt.close(fig)

    def test_categorical_faces_never_blend_between_areas(self, atlas):
        """A face straddling two areas must take ONE of their palette
        colors, never a third (averaged) code's color."""
        import matplotlib.colors as mcolors

        from multivae_tpu.utils.colors import get_color_list

        areas = [atlas.roi_names[0], atlas.roi_names[1],
                 atlas.roi_names[2], atlas.roi_names[3]]
        palette = get_color_list(len(areas))
        cmap = mcolors.ListedColormap(palette)
        vv = atlas.vertex_values(
            {n: float(i) + 0.01 for i, n in enumerate(areas)})
        rgba = _face_colors(atlas, vv["left"], "left", cmap, 0.0,
                            float(len(palette)), categorical=True)
        allowed = {tuple(np.round(mcolors.to_rgba(c), 6)) for c in palette}
        allowed.add((0.82, 0.82, 0.82, 1.0))  # background gray
        got = {tuple(np.round(c, 6)) for c in rgba}
        assert got <= allowed

    def test_all_nan_values_raise(self, atlas):
        with pytest.raises(ValueError, match="finite"):
            plot_roi_values(atlas, {atlas.roi_names[0]: float("nan")})

    def test_mosaic_rows(self, atlas, tmp_path):
        out = str(tmp_path / "mosaic.png")
        fig = plot_mosaic_on_atlas(
            atlas,
            [{atlas.roi_names[0]: 1.0}, {atlas.roi_names[4]: -1.0}],
            ["score_0", "score_1"], out)
        assert os.path.isfile(out)
        assert len(fig.axes) == 8
        matplotlib.pyplot.close(fig)


class TestPlotAreasDispatch:
    """viz.plotting.plot_areas prefers a resolved atlas over nilearn or
    the bar-chart fallback."""

    def test_env_var_dispatch(self, atlas, tmp_path, monkeypatch):
        from multivae_tpu.viz import plotting as vp

        path = str(tmp_path / "a.npz")
        atlas.save(path)
        monkeypatch.setenv(ATLAS_ENV_VAR, path)
        out = str(tmp_path / "areas.png")
        fig = vp.plot_areas([atlas.roi_names[0]], np.array([0.01]),
                            save_path=out)
        assert os.path.isfile(out)
        assert all(ax.name == "3d" for ax in fig.axes)
        matplotlib.pyplot.close(fig)

    def test_mismatched_atlas_falls_back_instead_of_crashing(
            self, atlas, tmp_path, monkeypatch):
        """A globally-set atlas that doesn't cover this cohort's ROI names
        must degrade to the fallback rendering, not abort the workflow."""
        from multivae_tpu.viz import plotting as vp

        path = str(tmp_path / "a.npz")
        atlas.save(path)
        monkeypatch.setenv(ATLAS_ENV_VAR, path)
        monkeypatch.setattr(vp, "HAS_NILEARN", False)
        out = str(tmp_path / "mismatch.png")
        fig = vp.plot_areas(["not_an_atlas_roi"], np.array([0.01]),
                            save_path=out)
        assert os.path.isfile(out)
        assert all(ax.name != "3d" for ax in fig.axes)
        matplotlib.pyplot.close(fig)

    def test_without_atlas_falls_back(self, tmp_path, monkeypatch):
        from multivae_tpu.viz import plotting as vp

        monkeypatch.delenv(ATLAS_ENV_VAR, raising=False)
        monkeypatch.setattr(vp, "HAS_NILEARN", False)
        out = str(tmp_path / "fallback.png")
        fig = vp.plot_areas(["roiA"], np.array([1.0]), save_path=out)
        assert os.path.isfile(out)
        assert all(ax.name != "3d" for ax in fig.axes)
        matplotlib.pyplot.close(fig)
