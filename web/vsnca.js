/**
 * vsnca.js — WebGL2 runtime for vsnca_tpu exported NCA models.
 *
 * A fresh implementation of the browser deployment path (the role of the
 * reference's docs/dynca.js, redesigned):
 *  - state lives in ceil(C/4) RGBA32F textures updated in one fused pass via
 *    multiple render targets (perception + update-MLP + stochastic mask in a
 *    single shader — no intermediate perception texture round-trip);
 *  - weights upload as float textures (one per dense layer), read with
 *    texelFetch;
 *  - conditioning: Cartesian positional encoding computed analytically, or a
 *    Sobel/Laplacian edge map of a live content texture (webcam / video /
 *    canvas) computed in-shader;
 *  - stochastic update mask from a PCG hash of (pixel, step counter).
 *
 * Consumes the JSON emitted by vsnca_tpu.export.webgl (scale/center
 * normalized float atlas, RGBA-quad packing, bias as last input row).
 */
"use strict";

function detileLayer(layer) {
  // Inverse of export tiling for model index 0.
  const [rows, cols] = layer.shape;
  const quads = Math.ceil(cols / 4);
  const [, atlasW] = layer.data_shape; // data_shape: [H, W, 4]
  const data = layer.data_flatten;
  const out = new Float32Array(rows * cols);
  const s = layer.scale, c = layer.center;
  for (let r = 0; r < rows; r++) {
    for (let q = 0; q < quads; q++) {
      for (let k = 0; k < 4; k++) {
        const col = q * 4 + k;
        if (col >= cols) continue;
        const v = data[(r * atlasW + q) * 4 + k];
        out[r * cols + col] = v * s - c * s;
      }
    }
  }
  return { rows, cols, data: out };
}

const QUAD_VS = `#version 300 es
precision highp float;
const vec2 verts[4] = vec2[4](vec2(-1.,-1.), vec2(1.,-1.), vec2(-1.,1.), vec2(1.,1.));
out vec2 uv;
void main() {
  vec2 p = verts[gl_VertexID];
  uv = p * 0.5 + 0.5;
  gl_Position = vec4(p, 0., 1.);
}`;

function stepShaderSource(C, FC, COND, padMode) {
  const NTEX = Math.ceil(C / 4);
  const P = 4 * C + COND;
  // padMode: 0 zeros, 1 replicate, 2 circular
  return `#version 300 es
precision highp float;
precision highp int;
precision highp sampler2D;

${Array.from({ length: NTEX }, (_, i) => `uniform sampler2D u_state${i};`).join("\n")}
uniform sampler2D u_w1;      // (P+1) x FC
uniform sampler2D u_w2;      // (FC+1) x C
uniform sampler2D u_content; // grayscale content (edge conditioning)
uniform ivec2 u_size;
uniform int u_step;
uniform float u_rate;
uniform int u_condMode;      // 0 none, 1 pos_emb, 2 edges

in vec2 uv;
${Array.from({ length: NTEX }, (_, i) => `layout(location=${i}) out vec4 o_state${i};`).join("\n")}

ivec2 wrapCoord(ivec2 p) {
${padMode === 2
  ? `  return ivec2((p.x + u_size.x) % u_size.x, (p.y + u_size.y) % u_size.y);`
  : `  return clamp(p, ivec2(0), u_size - 1);`}
}

vec4 fetchState(int t, ivec2 p) {
${padMode === 0
  ? `  if (p.x < 0 || p.y < 0 || p.x >= u_size.x || p.y >= u_size.y) return vec4(0.);`
  : ``}
  ivec2 q = wrapCoord(p);
  ${Array.from({ length: NTEX }, (_, i) => `if (t == ${i}) return texelFetch(u_state${i}, q, 0);`).join("\n  ")}
  return vec4(0.);
}

float contentGray(ivec2 p) {
  p = clamp(p, ivec2(0), u_size - 1);
  return texelFetch(u_content, p, 0).r;
}

// PCG hash → uniform [0,1)
float rnd(ivec2 p, int step) {
  uint s = uint(p.x) * 1973u ^ uint(p.y) * 9277u ^ uint(step) * 26699u;
  s = s * 747796405u + 2891336453u;
  uint w = ((s >> ((s >> 28u) + 4u)) ^ s) * 277803737u;
  w = (w >> 22u) ^ w;
  return float(w) * (1.0 / 4294967296.0);
}

void main() {
  ivec2 p = ivec2(gl_FragCoord.xy);

  // --- neighborhood: n[di][dj] packed per texture ---
  vec4 nb[${NTEX}][3][3];
  for (int di = 0; di < 3; di++)
    for (int dj = 0; dj < 3; dj++)
      for (int t = 0; t < ${NTEX}; t++)
        nb[t][di][dj] = fetchState(t, p + ivec2(dj - 1, di - 1));

  // fixed filters (cross-correlation; sobel-y = transpose of sobel-x)
  vec4 sx[${NTEX}]; vec4 sy[${NTEX}]; vec4 lap[${NTEX}]; vec4 cen[${NTEX}];
  for (int t = 0; t < ${NTEX}; t++) {
    cen[t] = nb[t][1][1];
    sx[t] = -nb[t][0][0] + nb[t][0][2] - 2.*nb[t][1][0] + 2.*nb[t][1][2] - nb[t][2][0] + nb[t][2][2];
    sy[t] = -nb[t][0][0] - 2.*nb[t][0][1] - nb[t][0][2] + nb[t][2][0] + 2.*nb[t][2][1] + nb[t][2][2];
    lap[t] = nb[t][0][0] + 2.*nb[t][0][1] + nb[t][0][2] + 2.*nb[t][1][0] - 12.*nb[t][1][1]
           + 2.*nb[t][1][2] + nb[t][2][0] + 2.*nb[t][2][1] + nb[t][2][2];
  }

  // percept vector, reference channel-block order [raw | sx | sy | lap | cond]
  float percept[${P}];
  for (int c = 0; c < ${C}; c++) {
    int t = c / 4; int k = c % 4;
    percept[c]            = cen[t][k];
    percept[${C} + c]     = sx[t][k];
    percept[${2 * C} + c] = sy[t][k];
    percept[${3 * C} + c] = lap[t][k];
  }
${COND > 0 ? `
  if (u_condMode == 1) {
    // CPE2D: channel 0 varies with rows (y), channel 1 with cols (x)
    percept[${4 * C}]     = 2.0 * ((float(p.y) / float(u_size.y)) - 0.5 + 0.5 / float(u_size.y));
    percept[${4 * C} + 1] = 2.0 * ((float(p.x) / float(u_size.x)) - 0.5 + 0.5 / float(u_size.x));
  } else if (u_condMode == 2) {
    // Sobel/Laplacian edge map of the grayscale content. Border uses
    // clamp-to-edge (the training-side EdgeExtractor zero-pads; differs
    // only on the outermost pixel ring).
    float g00 = contentGray(p + ivec2(-1,-1)), g01 = contentGray(p + ivec2(0,-1)), g02 = contentGray(p + ivec2(1,-1));
    float g10 = contentGray(p + ivec2(-1, 0)), g11 = contentGray(p),               g12 = contentGray(p + ivec2(1, 0));
    float g20 = contentGray(p + ivec2(-1, 1)), g21 = contentGray(p + ivec2(0, 1)), g22 = contentGray(p + ivec2(1, 1));
    percept[${4 * C}]     = -g00 + g02 - 2.*g10 + 2.*g12 - g20 + g22;
    percept[${4 * C} + 1] = -g00 - 2.*g01 - g02 + g20 + 2.*g21 + g22;
    percept[${4 * C} + 2] = g00 + 2.*g01 + g02 + 2.*g10 - 12.*g11 + 2.*g12 + g20 + 2.*g21 + g22;
  }` : ``}

  // dense layer 1: h = relu(W1^T percept + b1); W1 texture rows = inputs
  float hbuf[${FC}];
  for (int f = 0; f < ${FC}; f++) {
    float acc = texelFetch(u_w1, ivec2(f, ${P}), 0).r; // bias row
    for (int i = 0; i < ${P}; i++)
      acc += percept[i] * texelFetch(u_w1, ivec2(f, i), 0).r;
    hbuf[f] = max(acc, 0.0);
  }

  // dense layer 2 + stochastic residual
  float mask = (rnd(p, u_step) + u_rate) >= 1.0 ? 1.0 : 0.0;
  ${Array.from({ length: NTEX }, (_, t) => `vec4 outv${t} = cen[${t}];`).join("\n  ")}
  for (int c = 0; c < ${C}; c++) {
    float acc = texelFetch(u_w2, ivec2(c, ${FC}), 0).r; // bias row
    for (int f = 0; f < ${FC}; f++)
      acc += hbuf[f] * texelFetch(u_w2, ivec2(c, f), 0).r;
    int t = c / 4; int k = c % 4;
    ${Array.from({ length: NTEX }, (_, t) => `if (t == ${t}) outv${t}[k] += acc * mask;`).join("\n    ")}
  }
  ${Array.from({ length: NTEX }, (_, t) => `o_state${t} = outv${t};`).join("\n  ")}
}`;
}

const DRAW_FS = `#version 300 es
precision highp float;
uniform sampler2D u_state0;
in vec2 uv;
out vec4 color;
void main() {
  vec3 rgb = texture(u_state0, uv).rgb * 2.0;   // to_rgb: first 3 channels x2
  color = vec4(clamp((rgb + 1.0) * 0.5, 0.0, 1.0), 1.0);
}`;

const GRAY_FS = `#version 300 es
precision highp float;
uniform sampler2D u_src;
in vec2 uv;
out vec4 color;
void main() {
  vec3 c = texture(u_src, uv).rgb;
  float g = (c.r + c.g + c.b) / 3.0;   // channel-mean grayscale, in [-1,1]
  color = vec4(vec3(g * 2.0 - 1.0), 1.0);
}`;

class VSNCA {
  constructor(gl, modelJson, size, opts = {}) {
    this.gl = gl;
    this.W = size[0];
    this.H = size[1];
    this.rate = opts.updateRate ?? 0.5;
    this.padMode = { zeros: 0, replicate: 1, circular: 2 }[opts.padding ?? "circular"];
    this.step_ = 0;

    const l1 = detileLayer(modelJson.layers[0]);
    const l2 = detileLayer(modelJson.layers[1]);
    this.FC = l1.cols;
    this.C = l2.cols;
    const meta = modelJson.layers[0];
    this.condMode = meta.pos_emb ? 1 : meta.edge_conditioning ? 2 : 0;
    this.COND = this.condMode === 1 ? 2 : this.condMode === 2 ? 3 : 0;
    const P = 4 * this.C + this.COND;
    if (l1.rows !== P + 1)
      throw new Error(`layer1 rows ${l1.rows} != 4*C+COND+1 = ${P + 1}`);
    this.NTEX = Math.ceil(this.C / 4);

    const ext = gl.getExtension("EXT_color_buffer_float");
    if (!ext) throw new Error("EXT_color_buffer_float required");

    this._initPrograms();
    this._initWeights(l1, l2);
    this._initState();
  }

  _compile(vs, fs) {
    const gl = this.gl;
    const mk = (type, src) => {
      const s = gl.createShader(type);
      gl.shaderSource(s, src);
      gl.compileShader(s);
      if (!gl.getShaderParameter(s, gl.COMPILE_STATUS))
        throw new Error(gl.getShaderInfoLog(s) + "\n" + src.split("\n").map((l, i) => `${i + 1}: ${l}`).join("\n"));
      return s;
    };
    const p = gl.createProgram();
    gl.attachShader(p, mk(gl.VERTEX_SHADER, vs));
    gl.attachShader(p, mk(gl.FRAGMENT_SHADER, fs));
    gl.linkProgram(p);
    if (!gl.getProgramParameter(p, gl.LINK_STATUS))
      throw new Error(gl.getProgramInfoLog(p));
    return p;
  }

  _initPrograms() {
    this.stepProg = this._compile(
      QUAD_VS, stepShaderSource(this.C, this.FC, this.COND, this.padMode));
    this.drawProg = this._compile(QUAD_VS, DRAW_FS);
    this.grayProg = this._compile(QUAD_VS, GRAY_FS);
    this.vao = this.gl.createVertexArray();
  }

  _floatTex(w, h, data, format) {
    const gl = this.gl;
    const tex = gl.createTexture();
    gl.bindTexture(gl.TEXTURE_2D, tex);
    gl.texParameteri(gl.TEXTURE_2D, gl.TEXTURE_MIN_FILTER, gl.NEAREST);
    gl.texParameteri(gl.TEXTURE_2D, gl.TEXTURE_MAG_FILTER, gl.NEAREST);
    gl.texParameteri(gl.TEXTURE_2D, gl.TEXTURE_WRAP_S, gl.CLAMP_TO_EDGE);
    gl.texParameteri(gl.TEXTURE_2D, gl.TEXTURE_WRAP_T, gl.CLAMP_TO_EDGE);
    if (format === "R32F")
      gl.texImage2D(gl.TEXTURE_2D, 0, gl.R32F, w, h, 0, gl.RED, gl.FLOAT, data);
    else
      gl.texImage2D(gl.TEXTURE_2D, 0, gl.RGBA32F, w, h, 0, gl.RGBA, gl.FLOAT, data);
    return tex;
  }

  _initWeights(l1, l2) {
    // weight textures: x = output unit, y = input row (bias = last row)
    this.w1Tex = this._floatTex(l1.cols, l1.rows, l1.data, "R32F");
    this.w2Tex = this._floatTex(l2.cols, l2.rows, l2.data, "R32F");
  }

  _initState() {
    const gl = this.gl;
    const zero = new Float32Array(this.W * this.H * 4);
    this.stateTex = [0, 1].map(() =>
      Array.from({ length: this.NTEX }, () =>
        this._floatTex(this.W, this.H, zero)));
    this.fbo = [0, 1].map((i) => {
      const f = gl.createFramebuffer();
      gl.bindFramebuffer(gl.FRAMEBUFFER, f);
      this.stateTex[i].forEach((t, k) =>
        gl.framebufferTexture2D(gl.FRAMEBUFFER, gl.COLOR_ATTACHMENT0 + k,
          gl.TEXTURE_2D, t, 0));
      return f;
    });
    this.cur = 0;
    this.contentTex = this._floatTex(this.W, this.H,
      new Float32Array(this.W * this.H * 4));
    this.grayFbo = gl.createFramebuffer();
    gl.bindFramebuffer(gl.FRAMEBUFFER, this.grayFbo);
    gl.framebufferTexture2D(gl.FRAMEBUFFER, gl.COLOR_ATTACHMENT0,
      gl.TEXTURE_2D, this.contentTex, 0);
    gl.bindFramebuffer(gl.FRAMEBUFFER, null);
  }

  reset() {
    const gl = this.gl;
    const zero = new Float32Array(this.W * this.H * 4);
    for (const set of this.stateTex)
      for (const t of set) {
        gl.bindTexture(gl.TEXTURE_2D, t);
        gl.texSubImage2D(gl.TEXTURE_2D, 0, 0, 0, this.W, this.H,
          gl.RGBA, gl.FLOAT, zero);
      }
    this.step_ = 0;
  }

  /** Upload a content frame (canvas/video/img element) as the grayscale
   *  conditioning source. */
  setContent(source) {
    const gl = this.gl;
    const tmp = gl.createTexture();
    gl.bindTexture(gl.TEXTURE_2D, tmp);
    gl.texParameteri(gl.TEXTURE_2D, gl.TEXTURE_MIN_FILTER, gl.LINEAR);
    gl.texParameteri(gl.TEXTURE_2D, gl.TEXTURE_MAG_FILTER, gl.LINEAR);
    gl.texParameteri(gl.TEXTURE_2D, gl.TEXTURE_WRAP_S, gl.CLAMP_TO_EDGE);
    gl.texParameteri(gl.TEXTURE_2D, gl.TEXTURE_WRAP_T, gl.CLAMP_TO_EDGE);
    gl.pixelStorei(gl.UNPACK_FLIP_Y_WEBGL, false);
    gl.texImage2D(gl.TEXTURE_2D, 0, gl.RGBA, gl.RGBA, gl.UNSIGNED_BYTE, source);
    // grayscale pass into contentTex
    gl.bindFramebuffer(gl.FRAMEBUFFER, this.grayFbo);
    gl.viewport(0, 0, this.W, this.H);
    gl.useProgram(this.grayProg);
    gl.bindVertexArray(this.vao);
    gl.activeTexture(gl.TEXTURE0);
    gl.bindTexture(gl.TEXTURE_2D, tmp);
    gl.uniform1i(gl.getUniformLocation(this.grayProg, "u_src"), 0);
    gl.drawArrays(gl.TRIANGLE_STRIP, 0, 4);
    gl.bindFramebuffer(gl.FRAMEBUFFER, null);
    gl.deleteTexture(tmp);
  }

  step(n = 1) {
    const gl = this.gl;
    gl.useProgram(this.stepProg);
    gl.bindVertexArray(this.vao);
    gl.viewport(0, 0, this.W, this.H);
    const loc = (n) => gl.getUniformLocation(this.stepProg, n);
    gl.uniform2i(loc("u_size"), this.W, this.H);
    gl.uniform1f(loc("u_rate"), this.rate);
    gl.uniform1i(loc("u_condMode"), this.condMode);
    for (let it = 0; it < n; it++) {
      const src = this.cur, dst = 1 - this.cur;
      gl.bindFramebuffer(gl.FRAMEBUFFER, this.fbo[dst]);
      gl.drawBuffers(Array.from({ length: this.NTEX },
        (_, k) => gl.COLOR_ATTACHMENT0 + k));
      for (let t = 0; t < this.NTEX; t++) {
        gl.activeTexture(gl.TEXTURE0 + t);
        gl.bindTexture(gl.TEXTURE_2D, this.stateTex[src][t]);
        gl.uniform1i(loc(`u_state${t}`), t);
      }
      gl.activeTexture(gl.TEXTURE0 + this.NTEX);
      gl.bindTexture(gl.TEXTURE_2D, this.w1Tex);
      gl.uniform1i(loc("u_w1"), this.NTEX);
      gl.activeTexture(gl.TEXTURE0 + this.NTEX + 1);
      gl.bindTexture(gl.TEXTURE_2D, this.w2Tex);
      gl.uniform1i(loc("u_w2"), this.NTEX + 1);
      gl.activeTexture(gl.TEXTURE0 + this.NTEX + 2);
      gl.bindTexture(gl.TEXTURE_2D, this.contentTex);
      gl.uniform1i(loc("u_content"), this.NTEX + 2);
      gl.uniform1i(loc("u_step"), this.step_++);
      gl.drawArrays(gl.TRIANGLE_STRIP, 0, 4);
      this.cur = dst;
    }
    gl.bindFramebuffer(gl.FRAMEBUFFER, null);
  }

  draw(canvasW, canvasH) {
    const gl = this.gl;
    gl.bindFramebuffer(gl.FRAMEBUFFER, null);
    gl.viewport(0, 0, canvasW, canvasH);
    gl.useProgram(this.drawProg);
    gl.bindVertexArray(this.vao);
    gl.activeTexture(gl.TEXTURE0);
    gl.bindTexture(gl.TEXTURE_2D, this.stateTex[this.cur][0]);
    gl.uniform1i(gl.getUniformLocation(this.drawProg, "u_state0"), 0);
    gl.drawArrays(gl.TRIANGLE_STRIP, 0, 4);
  }

  /** Read back the RGB frame as Float32Array [H*W*4] (channels 0..2 of
   *  texture 0, raw state values). */
  readState() {
    const gl = this.gl;
    const out = new Float32Array(this.W * this.H * 4);
    gl.bindFramebuffer(gl.FRAMEBUFFER, this.fbo[this.cur]);
    gl.readBuffer(gl.COLOR_ATTACHMENT0);
    gl.readPixels(0, 0, this.W, this.H, gl.RGBA, gl.FLOAT, out);
    gl.bindFramebuffer(gl.FRAMEBUFFER, null);
    return out;
  }

  /** Wall-clock benchmark: ms/step over nSteps (readback fence). */
  benchmark(nSteps = 200) {
    this.step(1); // warm
    const t0 = performance.now();
    this.step(nSteps);
    this.readState(); // fence
    return (performance.now() - t0) / nSteps;
  }
}

if (typeof module !== "undefined") module.exports = { VSNCA, detileLayer };
