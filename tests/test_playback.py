"""Playback export (reference StaticHtml analog,
examples/example_base.cc:173-181): solved trajectories export as ONE
self-contained HTML with embedded scene keyframes and no network fetches."""
import json
import re

import numpy as np

from idto_tpu.examples.registry import load_example
from idto_tpu.utils.playback import export_html, trajectory_scene_data


def test_scene_data_shapes_and_unit_quats():
    model, cfg, prob, params, q_guess = load_example("spinner",
                                                     test_mode=True)
    scene = trajectory_scene_data(model, q_guess, prob.dt)
    ng = model.geoms.num_geoms
    frames = np.asarray(scene["frames"])
    assert frames.shape == (prob.num_steps + 1, ng, 7)
    norms = np.linalg.norm(frames[..., :4], axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)
    assert len(scene["geoms"]) == ng
    assert scene["dt"] == prob.dt
    types = {g["type"] for g in scene["geoms"]}
    assert types <= {"sphere", "box", "capsule", "cylinder", "halfspace"}


def test_export_html_self_contained(tmp_path):
    model, cfg, prob, params, q_guess = load_example("spinner",
                                                     test_mode=True)
    out = export_html(model, q_guess, prob.dt, str(tmp_path / "out.html"),
                      title="spinner")
    html = open(out).read()
    # Self-contained: no external fetches of any kind.
    assert "http://" not in html and "https://" not in html
    assert "<script src" not in html
    # The embedded scene JSON parses and matches the trajectory.
    m = re.search(r"const SCENE = (\{.*?\});\n", html, re.S)
    assert m, "embedded scene JSON not found"
    scene = json.loads(m.group(1))
    assert len(scene["frames"]) == prob.num_steps + 1
    assert len(scene["geoms"]) == model.geoms.num_geoms


def test_world_fixed_geoms_do_not_move():
    model, cfg, prob, params, q_guess = load_example("spinner",
                                                     test_mode=True)
    scene = trajectory_scene_data(model, q_guess, prob.dt)
    frames = np.asarray(scene["frames"])
    for i, g in enumerate(scene["geoms"]):
        if g["body"] < 0:
            np.testing.assert_array_equal(frames[:, i], frames[0:1, i])
