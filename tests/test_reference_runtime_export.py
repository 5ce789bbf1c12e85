"""Close the export loop against the REFERENCE runtime.

Loads a vsnca_tpu-exported model JSON into the reference's own WebGL
runtime — the actual GLSL shader sources and pipeline of
/root/reference/docs/dynca.js (perception → dense x2 → stochastic update,
docs/dynca.js:1056-1132) — executed headlessly on Mesa/llvmpipe, and
compares the stepped state against our XLA ``dynca_step``.

This is the drift test VERDICT r3 asked for (missing #2): the weight
atlas layout, scale/center dequantization, pos_emb/edge row order, bias
row, and the dense shader's read pattern (dynca.js:494-600) are all
exercised by the reference's own code; any export-format drift fails here.

Harness notes:
- The reference ships WebGL1 (GLSL ES 1.00) sources with no #version
  line; we prepend ``#version 100`` (desktop GL accepts ES 1.00 via
  ARB_ES2_compatibility, core since 4.1) — a context shim, not a source
  modification. Defines are exactly the runtime's own
  (``#define OURS`` + ``#define SPARSE_UPDATE`` — dynca.js:904 with
  our_version=true, shuffledMode=true).
- SPARSE_UPDATE is driven with updateProbability=1.0 and the identity
  shuffle/unshuffle textures (setupBuffers with shuffleH == gridH and
  k == i), so every cell updates — matching our update_rate=1.0 step.
- OURS means replicate padding in _getUV (dynca.js:135-139), so the JAX
  reference config uses padding_mode='replicate'.
"""

import json
import re

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vsnca_tpu.config import NCAConfig
from vsnca_tpu.export.webgl import export_models_to_webgl_json
from vsnca_tpu.models.dynca import dynca_init, dynca_step, make_conditioning

from tests.test_webgl_compile import _compile_program, _find_template, gl  # noqa: F401

REF_JS = "/root/reference/docs/dynca.js"

pytestmark = pytest.mark.skipif(
    not __import__("os").path.exists(REF_JS),
    reason="reference checkout not present",
)


# ----------------------------------------------------- shader extraction


def _ref_src():
    return open(REF_JS).read()


def _const_template(src: str, name: str) -> str:
    i = src.index(f"const {name} = `")
    body, _ = _find_template(src, src.index("`", i))
    return body


def _definput_template(src: str) -> str:
    i = src.index("function defInput(name)")
    body, _ = _find_template(src, src.index("`", i))
    return body


def _programs(src: str) -> dict:
    """Extract the PROGRAMS object literal's `name: \\`...\\`` entries."""
    start = src.index("const PROGRAMS = {")
    progs = {}
    i = start
    while True:
        m = re.compile(r"(\w+):\s*`").search(src, i)
        if not m:
            break
        name = m.group(1)
        body, end = _find_template(src, src.index("`", m.start()))
        progs[name] = body
        i = end + 1
        if "\n}" in src[end : src.find("`", end + 1) if src.find("`", end + 1) > 0 else len(src)] and name == "vis":
            break
        if name == "vis":  # last program in the object
            break
    return progs


def _render_definputs(body: str, definput: str) -> str:
    """Substitute every ${defInput('X')} with the rendered template."""

    def sub(m):
        return definput.replace("${name}", m.group(1))

    return re.sub(r"\$\{defInput\('(\w+)'\)\}", sub, body)


def build_reference_shaders():
    src = _ref_src()
    definput = _definput_template(src)
    vs = _const_template(src, "vs_code")
    prefix = _render_definputs(_const_template(src, "PREFIX"), definput)
    progs = {
        k: _render_definputs(v, definput)
        for k, v in _programs(src).items()
    }
    defines = "#define OURS\n#define SPARSE_UPDATE\n"  # dynca.js:904
    version = "#version 100\n"
    fs = {k: version + defines + prefix + v for k, v in progs.items()}
    assert "${" not in prefix and all("${" not in v for v in fs.values())
    return version + vs, fs


# ------------------------------------------------------- GL tensor utils


class RefTensor:
    """createTensor (dynca.js:789-815): depth packed into a gridded RGBA
    float texture; exposes the Tensor-struct uniforms."""

    def __init__(self, glc, w, h, depth, pack_scale_zero=(1.0, 0.0)):
        self.gl = glc
        self.w, self.h, self.depth = w, h, depth
        self.depth4 = int(np.ceil(depth / 4))
        self.gridW = int(np.ceil(np.sqrt(self.depth4)))
        self.gridH = (self.depth4 + self.gridW - 1) // self.gridW
        self.texW, self.texH = w * self.gridW, h * self.gridH
        self.pack = tuple(pack_scale_zero)
        self.tex = glc.glGenTextures(1)
        glc.glBindTexture(glc.GL_TEXTURE_2D, self.tex)
        for pn in (glc.GL_TEXTURE_MIN_FILTER, glc.GL_TEXTURE_MAG_FILTER):
            glc.glTexParameteri(glc.GL_TEXTURE_2D, pn, glc.GL_NEAREST)
        for pn in (glc.GL_TEXTURE_WRAP_S, glc.GL_TEXTURE_WRAP_T):
            glc.glTexParameteri(glc.GL_TEXTURE_2D, pn, glc.GL_REPEAT)
        glc.glTexImage2D(
            glc.GL_TEXTURE_2D, 0, glc.GL_RGBA32F, self.texW, self.texH, 0,
            glc.GL_RGBA, glc.GL_FLOAT,
            np.zeros((self.texH, self.texW, 4), np.float32),
        )
        self.fbo = glc.glGenFramebuffers(1)
        glc.glBindFramebuffer(glc.GL_FRAMEBUFFER, self.fbo)
        glc.glFramebufferTexture2D(
            glc.GL_FRAMEBUFFER, glc.GL_COLOR_ATTACHMENT0,
            glc.GL_TEXTURE_2D, self.tex, 0,
        )
        assert (glc.glCheckFramebufferStatus(glc.GL_FRAMEBUFFER)
                == glc.GL_FRAMEBUFFER_COMPLETE)

    def upload(self, arr_hwc: np.ndarray):
        """[h, w, depth] float (true values) → packed texture, honoring
        packScaleZero (setOutput stores v/scale + zero)."""
        h, w, d = arr_hwc.shape
        assert (h, w, d) == (self.h, self.w, self.depth)
        buf = np.zeros((self.texH, self.texW, 4), np.float32)
        for ch4 in range(self.depth4):
            ty, tx = divmod(ch4, self.gridW)
            tile = np.zeros((h, w, 4), np.float32)
            for k in range(4):
                c = ch4 * 4 + k
                if c < d:
                    tile[:, :, k] = arr_hwc[:, :, c]
            buf[ty * h : (ty + 1) * h, tx * w : (tx + 1) * w] = (
                tile / self.pack[0] + self.pack[1]
            )
        glc = self.gl
        glc.glBindTexture(glc.GL_TEXTURE_2D, self.tex)
        glc.glTexSubImage2D(glc.GL_TEXTURE_2D, 0, 0, 0, self.texW, self.texH,
                            glc.GL_RGBA, glc.GL_FLOAT,
                            np.ascontiguousarray(buf))

    def read(self) -> np.ndarray:
        glc = self.gl
        glc.glBindFramebuffer(glc.GL_FRAMEBUFFER, self.fbo)
        buf = np.zeros((self.texH, self.texW, 4), np.float32)
        glc.glReadPixels(0, 0, self.texW, self.texH, glc.GL_RGBA,
                         glc.GL_FLOAT, buf)
        out = np.zeros((self.h, self.w, self.depth), np.float32)
        for ch4 in range(self.depth4):
            ty, tx = divmod(ch4, self.gridW)
            tile = buf[ty * self.h : (ty + 1) * self.h,
                       tx * self.w : (tx + 1) * self.w]
            for k in range(4):
                c = ch4 * 4 + k
                if c < self.depth:
                    out[:, :, c] = (tile[:, :, k] - self.pack[1]) * self.pack[0]
        return out


class ReferenceRuntime:
    """Python driver for the reference pipeline: mirrors DyNCA.step()
    (dynca.js:1056-1132) and runDense/runLayer uniform plumbing
    (dynca.js:1216-1252) on a real GL context."""

    def __init__(self, glc, models_json, grid_wh, edgemap=None):
        self.gl = glc
        self.W, self.H = grid_wh
        self.n_scales = models_json.get("n_perception_scales", 1)
        vs, fs = build_reference_shaders()
        need = ["perception", "dense", "update"]
        if self.n_scales > 1:
            need += ["bilinear_downsample", "bilinear_upsample_add"]
        self.progs = {k: _compile_program(glc, vs, fs[k]) for k in need}
        self.layers = [self._dense_info(l) for l in models_json["layers"]]

        c_n = self.layers[-1]["out_n"]
        p_n = self.layers[0]["in_n"]
        self.buf = {
            "state": RefTensor(glc, self.W, self.H, c_n),
            "newState": RefTensor(glc, self.W, self.H, c_n),
            "perception0": RefTensor(glc, self.W, self.H, p_n),
            "edgemap": RefTensor(glc, self.W, self.H, 4),
        }
        for i, l in enumerate(self.layers):
            self.buf[f"layer{i}"] = RefTensor(glc, self.W, self.H, l["out_n"])
        if self.n_scales > 1:
            w2, h2 = int(self.W // 2 + 0.5), int(self.H // 2 + 0.5)
            self.buf["state_down"] = RefTensor(glc, w2, h2, c_n)
            self.buf["perception1"] = RefTensor(glc, w2, h2, p_n)
            self.buf["perception"] = RefTensor(glc, self.W, self.H, p_n)
        if edgemap is not None:
            self.buf["edgemap"].upload(
                np.concatenate(
                    [edgemap, np.ones(edgemap.shape[:2] + (1,), np.float32)],
                    axis=-1,
                )
            )
        # identity shuffle/unshuffle (setupBuffers with p=1.0 and k == i)
        idx = np.arange(self.W * self.H)
        shuf = np.zeros((self.H, self.W, 4), np.float32)
        shuf[..., 0] = (idx % self.W).reshape(self.H, self.W)
        shuf[..., 1] = (idx // self.W).reshape(self.H, self.W)
        unshuf = shuf.copy()
        unshuf[..., 2] = 255.0
        self.shuffle_tex = self._raw_tex(shuf)
        self.unshuffle_tex = self._raw_tex(unshuf)

    def _raw_tex(self, arr_hw4):
        glc = self.gl
        t = glc.glGenTextures(1)
        glc.glBindTexture(glc.GL_TEXTURE_2D, t)
        for pn in (glc.GL_TEXTURE_MIN_FILTER, glc.GL_TEXTURE_MAG_FILTER):
            glc.glTexParameteri(glc.GL_TEXTURE_2D, pn, glc.GL_NEAREST)
        for pn in (glc.GL_TEXTURE_WRAP_S, glc.GL_TEXTURE_WRAP_T):
            glc.glTexParameteri(glc.GL_TEXTURE_2D, pn, glc.GL_REPEAT)
        h, w = arr_hw4.shape[:2]
        glc.glTexImage2D(glc.GL_TEXTURE_2D, 0, glc.GL_RGBA32F, w, h, 0,
                         glc.GL_RGBA, glc.GL_FLOAT,
                         np.ascontiguousarray(arr_hw4, np.float32))
        return t

    def _dense_info(self, params):
        """createDenseInfo (dynca.js:827-872), incl. its truthiness quirks."""
        in_n, out_n = params["shape"]
        info = {
            "layout": params["layout"], "out_n": out_n,
            "pos_emb": bool(params.get("pos_emb")),
            "bias": bool(params.get("bias", True)),
            "edge_conditioning": bool(params.get("edge_conditioning")),
            "coefs": [params["scale"], params.get("center", 127.0 / 255.0)],
        }
        ch_in = in_n
        ch_in -= 2 if info["pos_emb"] else 0
        ch_in -= 1 if info["bias"] else 0
        ch_in -= 3 if info["edge_conditioning"] else 0
        info["in_n"] = ch_in
        data = np.asarray(params["data_flatten"], np.float32).reshape(
            params["data_shape"]
        )
        info["tex"] = self._raw_tex(data)
        return info

    # ----------------------------------------------------------- passes

    def _set_tensor_uniforms(self, prog, name, tensor):
        glc = self.gl
        loc = lambda n: glc.glGetUniformLocation(prog, n)
        glc.glUniform2f(loc(f"{name}.size"), tensor.w, tensor.h)
        glc.glUniform2f(loc(f"{name}.gridSize"), tensor.gridW, tensor.gridH)
        glc.glUniform1f(loc(f"{name}.depth"), tensor.depth)
        glc.glUniform1f(loc(f"{name}.depth4"), tensor.depth4)
        glc.glUniform2f(loc(f"{name}.packScaleZero"), *tensor.pack)

    def _run(self, prog, output, tensors, floats=(), bools=(), vec2s=(),
             samplers=()):
        glc = self.gl
        glc.glBindFramebuffer(glc.GL_FRAMEBUFFER, output.fbo)
        glc.glViewport(0, 0, output.texW, output.texH)
        glc.glUseProgram(prog)
        loc = lambda n: glc.glGetUniformLocation(prog, n)

        unit = 0
        for name, tensor in tensors:
            self._set_tensor_uniforms(prog, name, tensor)
            if name != "u_output":
                glc.glActiveTexture(glc.GL_TEXTURE0 + unit)
                glc.glBindTexture(glc.GL_TEXTURE_2D, tensor.tex)
                glc.glUniform1i(loc(f"{name}_tex"), unit)
                unit += 1
        for name, tex in samplers:
            glc.glActiveTexture(glc.GL_TEXTURE0 + unit)
            glc.glBindTexture(glc.GL_TEXTURE_2D, tex)
            glc.glUniform1i(loc(name), unit)
            unit += 1
        for name, v in floats:
            glc.glUniform1f(loc(name), v)
        for name, v in bools:
            glc.glUniform1i(loc(name), int(v))
        for name, v in vec2s:
            glc.glUniform2f(loc(name), *v)

        # runLayer always provides the shuffle plumbing + HW
        glc.glActiveTexture(glc.GL_TEXTURE0 + unit)
        glc.glBindTexture(glc.GL_TEXTURE_2D, self.shuffle_tex)
        glc.glUniform1i(loc("u_shuffleTex"), unit)
        unit += 1
        glc.glActiveTexture(glc.GL_TEXTURE0 + unit)
        glc.glBindTexture(glc.GL_TEXTURE_2D, self.unshuffle_tex)
        glc.glUniform1i(loc("u_unshuffleTex"), unit)
        glc.glUniform2f(loc("u_shuffleOfs"), 0.0, 0.0)
        glc.glUniform2f(loc("HW"), self.W, self.H)

        # full-screen quad (two triangles, as this.quad)
        import ctypes

        verts = np.asarray(
            [-1, -1, 0, 1, -1, 0, -1, 1, 0, -1, 1, 0, 1, -1, 0, 1, 1, 0],
            np.float32,
        )
        vbo = glc.glGenBuffers(1)
        glc.glBindBuffer(glc.GL_ARRAY_BUFFER, vbo)
        glc.glBufferData(glc.GL_ARRAY_BUFFER, verts.nbytes, verts,
                         glc.GL_STATIC_DRAW)
        pos = glc.glGetAttribLocation(prog, "position")
        glc.glEnableVertexAttribArray(pos)
        glc.glVertexAttribPointer(pos, 3, glc.GL_FLOAT, False, 0,
                                  ctypes.c_void_p(0))
        glc.glDrawArrays(glc.GL_TRIANGLES, 0, 6)
        glc.glFinish()
        glc.glDeleteBuffers(1, [vbo])

    def step(self, seed=0.0):
        """DyNCA.step() with stage='all' (dynca.js:1056-1132), webcam and
        preprocess stages replaced by the pre-uploaded edgemap tensor."""
        common = [("u_angle", 0.0), ("u_alignment", 0.0), ("u_hexGrid", 0.0),
                  ("u_seed", seed), ("u_updateProbability", 1.0)]
        self._run(
            self.progs["perception"], self.buf["perception0"],
            [("u_input", self.buf["state"]),
             ("u_output", self.buf["perception0"])],
            floats=common, bools=[("scale_zero", True)],
        )
        if self.n_scales > 1:
            self._run(
                self.progs["bilinear_downsample"], self.buf["state_down"],
                [("u_input", self.buf["state"]),
                 ("u_output", self.buf["state_down"])],
                floats=common,
            )
            self._run(
                self.progs["perception"], self.buf["perception1"],
                [("u_input", self.buf["state_down"]),
                 ("u_output", self.buf["perception1"])],
                floats=common, bools=[("scale_zero", False)],
            )
            self._run(
                self.progs["bilinear_upsample_add"], self.buf["perception"],
                [("u_input", self.buf["perception1"]),
                 ("u_perception0", self.buf["perception0"]),
                 ("u_output", self.buf["perception"])],
                floats=common, bools=[("scale_zero", True)],
            )
            self.buf["perception0"], self.buf["perception"] = (
                self.buf["perception"], self.buf["perception0"],
            )

        inp = self.buf["perception0"]
        for i, layer in enumerate(self.layers):
            out = self.buf[f"layer{i}"]
            self._run(
                self.progs["dense"], out,
                [("u_input", inp), ("u_edgemap", self.buf["edgemap"]),
                 ("u_control", self.buf["edgemap"]),  # modelIdx hardcoded 0.5
                 ("u_output", out)],
                floats=common + [("u_fuzz", 0.0)],
                bools=[("bias", layer["bias"]), ("pos_emb", layer["pos_emb"]),
                       ("relu", i == 0),
                       ("edge_conditioning", layer["edge_conditioning"])],
                vec2s=[("u_weightCoefs", layer["coefs"]),
                       ("u_layout", layer["layout"])],
                samplers=[("u_weightTex", layer["tex"])],
            )
            inp = out
        self._run(
            self.progs["update"], self.buf["newState"],
            [("u_input", self.buf["state"]), ("u_update", inp),
             ("u_output", self.buf["newState"])],
            floats=common + [("u_rate", 1.0)],
        )
        self.buf["state"], self.buf["newState"] = (
            self.buf["newState"], self.buf["state"],
        )


# ------------------------------------------------------------------ tests


def _jax_reference_step(params, cfg, state_hwc, cond, n=1):
    x = jnp.asarray(state_hwc)[None]
    for i in range(n):
        x = dynca_step(params, x, jax.random.PRNGKey(i), cfg, cond)
    return np.asarray(x[0])


def test_reference_runtime_pos_emb_model(gl):
    """Our export stepped by the reference's own shaders == dynca_step
    (replicate padding, update_rate=1.0), over 3 compounding steps."""
    C, FC, H, W = 12, 32, 9, 8
    cfg = NCAConfig(c_in=C, fc_dim=FC, conditioning="pos_emb",
                    padding_mode="replicate", update_rate=1.0)
    params = dynca_init(jax.random.PRNGKey(0), cfg)
    js = export_models_to_webgl_json([params], ["m"], pos_emb=True)
    js = json.loads(json.dumps(js))  # through-the-wire JSON round trip

    rt = ReferenceRuntime(gl, js, (W, H))
    rng = np.random.RandomState(0)
    state = (rng.rand(H, W, C).astype(np.float32) - 0.5) * 0.5
    rt.buf["state"].upload(state)
    for s in range(3):
        rt.step(seed=float(s))
    got = rt.buf["state"].read()

    cond = make_conditioning(cfg, (H, W), batch=1)
    ref = _jax_reference_step(params, cfg, state, cond, n=3)
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=3e-4)


def test_reference_runtime_edge_model(gl):
    """Edge-conditioned export through the reference dense shader's
    edge taps (incl. its in-shader tanh, dynca.js:585-589)."""
    C, FC, H, W = 12, 32, 9, 8
    cfg = NCAConfig(c_in=C, fc_dim=FC, conditioning="edges",
                    edge_transform="tanh", padding_mode="replicate",
                    update_rate=1.0)
    params = dynca_init(jax.random.PRNGKey(0), cfg)
    js = export_models_to_webgl_json([params], ["m"], edge_conditioning=True)

    rng = np.random.RandomState(1)
    raw_edges = (rng.rand(H, W, 3).astype(np.float32) - 0.5) * 2.0
    rt = ReferenceRuntime(gl, js, (W, H), edgemap=raw_edges)
    state = (rng.rand(H, W, C).astype(np.float32) - 0.5) * 0.5
    rt.buf["state"].upload(state)
    rt.step()
    got = rt.buf["state"].read()

    # our side: cond = tanh(raw edges) fed directly (the runtime computes
    # the edge map from the webcam; here both sides get the same map)
    cond = jnp.tanh(jnp.asarray(raw_edges))[None]
    ref = _jax_reference_step(params, cfg, state, cond, n=1)
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=3e-4)


def test_reference_runtime_rejects_row_order_drift(gl):
    """Sensitivity check: a deliberately mis-ordered export (pos_emb rows
    swapped) must NOT pass — proves the test can catch format drift."""
    C, FC, H, W = 12, 32, 9, 8
    cfg = NCAConfig(c_in=C, fc_dim=FC, conditioning="pos_emb",
                    padding_mode="replicate", update_rate=1.0)
    params = dynca_init(jax.random.PRNGKey(0), cfg)
    bad = dict(params)
    w1 = np.array(params["w1"])
    w1[[4 * C, 4 * C + 1]] = w1[[4 * C + 1, 4 * C]]  # swap pos-emb rows
    bad["w1"] = jnp.asarray(w1)
    js = export_models_to_webgl_json([bad], ["m"], pos_emb=True)

    rt = ReferenceRuntime(gl, js, (W, H))
    rng = np.random.RandomState(0)
    state = (rng.rand(H, W, C).astype(np.float32) - 0.5) * 0.5
    rt.buf["state"].upload(state)
    rt.step()
    got = rt.buf["state"].read()

    cond = make_conditioning(cfg, (H, W), batch=1)
    ref = _jax_reference_step(params, cfg, state, cond, n=1)
    assert np.abs(got - ref).max() > 1e-3


def test_reference_runtime_multiscale_model(gl):
    """n_perception_scales=2 export through the reference's
    bilinear_downsample → perception → bilinear_upsample_add chain
    (dynca.js:1082-1095) == our perceive_multiscale step."""
    C, FC, H, W = 12, 32, 8, 8
    cfg = NCAConfig(c_in=C, fc_dim=FC, conditioning="pos_emb",
                    padding_mode="replicate", update_rate=1.0,
                    perception_scales=(0, 1))
    params = dynca_init(jax.random.PRNGKey(0), cfg)
    js = export_models_to_webgl_json([params], ["m"], pos_emb=True,
                                     n_perception_scales=2)
    assert js["n_perception_scales"] == 2  # dynca.js:881 reads this key

    rt = ReferenceRuntime(gl, js, (W, H))
    rng = np.random.RandomState(0)
    state = (rng.rand(H, W, C).astype(np.float32) - 0.5) * 0.5
    rt.buf["state"].upload(state)
    rt.step()
    got = rt.buf["state"].read()

    cond = make_conditioning(cfg, (H, W), batch=1)
    ref = _jax_reference_step(params, cfg, state, cond, n=1)
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=5e-4)
