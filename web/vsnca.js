/**
 * vsnca.js — WebGL2 runtime for vsnca_tpu exported NCA models.
 *
 * A fresh implementation of the browser deployment path (the role of the
 * reference's docs/dynca.js, redesigned):
 *  - state lives in ceil(C/4) RGBA32F textures updated in one fused pass via
 *    multiple render targets (perception + update-MLP + stochastic mask in a
 *    single shader — no intermediate perception texture round-trip);
 *  - MULTI-MODEL: all models in the exported atlas are detiled and stacked
 *    into one weight texture; a per-pixel control texture selects which
 *    model's weights each cell runs (interface parity with dynca.js'
 *    u_control path). paint(x, y, r, modelIdx) writes the control circle;
 *    setModel(idx) fills it.
 *  - brush tools: clearCircle(x, y, r[, zoom]) zeroes the state in a circle
 *    (damage/regeneration, dynca.js:874-875); paint() switches models.
 *  - conditioning: Cartesian positional encoding computed analytically
 *    (rotated by u_angle like the reference dense shader), or a
 *    Sobel/Laplacian edge map of a live content texture computed in-shader;
 *  - rotation / alignment (cartesian | polar | bipolar) and hex-grid filter
 *    variants (dynca.js:390-470): the perception responses are steered by
 *    the per-cell direction field;
 *  - stochastic update: either a PCG hash of (pixel, step counter), or
 *    EXACT-COUNT mode — a precomputed selection mask with exactly
 *    round(rate*N) ones, shifted by a random offset each step (the
 *    distributional semantics of dynca.js' SPARSE_UPDATE shuffle textures,
 *    :970-990). Our fused single-pass design keeps the gather/scatter out
 *    (masked cells early-out instead), trading the reference's sparse
 *    compute for zero intermediate textures.
 *  - draw(w, h, zoom) renders with center zoom like dynca.js draw(zoom).
 *
 * Consumes the JSON emitted by vsnca_tpu.export.webgl (scale/center
 * normalized float atlas, RGBA-quad packing, bias as last input row,
 * multi-model tiling with a [cols, rows] layout).
 */
"use strict";

function detileLayer(layer, modelIdx = 0) {
  // Inverse of export tiling (vsnca_tpu/export/webgl.py::tile2d) for one
  // model: tile (my, mx) of the atlas, my = idx / layoutX, mx = idx % layoutX.
  const [rows, cols] = layer.shape;
  const quads = Math.ceil(cols / 4);
  const [, atlasW] = layer.data_shape; // data_shape: [H, W, 4]
  const [lx] = layer.layout ?? [1, 1];
  const my = Math.floor(modelIdx / lx), mx = modelIdx % lx;
  const data = layer.data_flatten;
  const out = new Float32Array(rows * cols);
  const s = layer.scale, c = layer.center;
  for (let r = 0; r < rows; r++) {
    for (let q = 0; q < quads; q++) {
      for (let k = 0; k < 4; k++) {
        const col = q * 4 + k;
        if (col >= cols) continue;
        const v = data[((my * rows + r) * atlasW + mx * quads + q) * 4 + k];
        out[r * cols + col] = v * s - c * s;
      }
    }
  }
  return { rows, cols, data: out };
}

function countModels(modelJson) {
  return (modelJson.model_names ?? ["m"]).length;
}

function detileAllModels(layer, nModels) {
  // Stack all models row-wise: texture rows = nModels * rows.
  const { rows, cols } = detileLayer(layer, 0);
  const out = new Float32Array(nModels * rows * cols);
  for (let m = 0; m < nModels; m++)
    out.set(detileLayer(layer, m).data, m * rows * cols);
  return { rows, cols, nModels, data: out };
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
uniform sampler2D u_w1;      // (P+1) x FC, stacked per model
uniform sampler2D u_w2;      // (FC+1) x C, stacked per model
uniform sampler2D u_content; // grayscale content (edge conditioning)
uniform sampler2D u_control; // per-pixel model index
uniform sampler2D u_select;  // exact-count selection mask
uniform ivec2 u_size;
uniform int u_step;
uniform float u_rate;
uniform int u_condMode;      // 0 none, 1 pos_emb, 2 edges
uniform int u_exactCount;    // 1 = shifted exact-count selection mask
uniform ivec2 u_selOfs;      // per-step random offset of the selection mask
uniform float u_angle;       // perception rotation (radians)
uniform int u_alignment;     // 0 cartesian, 1 polar, 2 bipolar
uniform float u_hexGrid;     // 0..1 mixes square/hex filter variants

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

mat2 rotate2(float ang) {
  float s = sin(ang), c = cos(ang);
  return mat2(c, s, -s, c);
}

// per-cell direction field (dynca.js getCellDirection)
vec2 cellDirection(ivec2 p) {
  vec2 xy = vec2(p) + 0.5;
  vec2 dir = vec2(0.0, 1.0);
  if (u_alignment == 1) {
    dir = normalize(xy - 0.5 * vec2(u_size));
  } else if (u_alignment == 2) {
    vec2 v1 = xy - 0.25 * vec2(u_size);
    vec2 v2 = 0.75 * vec2(u_size) - xy;
    dir = normalize(v1 / pow(length(v1), 3.0) + v2 / pow(length(v2), 3.0));
  }
  return rotate2(u_angle) * dir;
}

void main() {
  ivec2 p = ivec2(gl_FragCoord.xy);

  // --- stochastic mask first: masked cells early-out (state unchanged) ---
  float mask;
  if (u_exactCount == 1) {
    ivec2 sp = ivec2((p.x - u_selOfs.x + u_size.x) % u_size.x,
                     (p.y - u_selOfs.y + u_size.y) % u_size.y);
    mask = texelFetch(u_select, sp, 0).r;
  } else {
    mask = (rnd(p, u_step) + u_rate) >= 1.0 ? 1.0 : 0.0;
  }

  // --- neighborhood: nb[t*9 + di*3 + dj] (GLSL ES 3.00 forbids nested
  // arrays — WebGL2 is ES 3.00, not 3.10) ---
  vec4 nb[${NTEX * 9}];
  for (int di = 0; di < 3; di++)
    for (int dj = 0; dj < 3; dj++)
      for (int t = 0; t < ${NTEX}; t++)
        nb[t * 9 + di * 3 + dj] = fetchState(t, p + ivec2(dj - 1, di - 1));

  if (mask == 0.0) {
    ${Array.from({ length: NTEX }, (_, t) => `o_state${t} = nb[${t} * 9 + 4];`).join("\n    ")}
    return;
  }

  // fixed filters (cross-correlation; sobel-y = transpose of sobel-x) and
  // their hex-grid variants (dynca.js:246-260, unnormalized like ours)
  float hx = u_hexGrid;
  vec4 sx[${NTEX}]; vec4 sy[${NTEX}]; vec4 lap[${NTEX}]; vec4 cen[${NTEX}];
  vec2 dirv = cellDirection(p);
  float ds = dirv.x, dc = dirv.y;
  for (int t = 0; t < ${NTEX}; t++) {
    #define NB(di, dj) nb[t * 9 + (di) * 3 + (dj)]
    cen[t] = NB(1, 1);
    vec4 gx = -NB(0,0) + NB(0,2) - 2.*NB(1,0) + 2.*NB(1,2) - NB(2,0) + NB(2,2);
    vec4 gy = -NB(0,0) - 2.*NB(0,1) - NB(0,2) + NB(2,0) + 2.*NB(2,1) + NB(2,2);
    vec4 gl2 = NB(0,0) + 2.*NB(0,1) + NB(0,2) + 2.*NB(1,0) - 12.*NB(1,1)
             + 2.*NB(1,2) + NB(2,0) + 2.*NB(2,1) + NB(2,2);
    if (hx > 0.0) {
      // hex-grid neighbor taps (corner taps shift along the skewed axes)
      vec4 hgx = -NB(0,1) + NB(0,2) - 2.*NB(1,0) + 2.*NB(1,2) - NB(2,0) + NB(2,1);
      vec4 hgy = -2.*NB(0,1) - 2.*NB(0,2) + 2.*NB(2,0) + 2.*NB(2,1);
      vec4 hgl = 2.*NB(0,1) + 2.*NB(0,2) + 2.*NB(1,0) - 12.*NB(1,1)
               + 2.*NB(1,2) + 2.*NB(2,0) + 2.*NB(2,1);
      gx = mix(gx, hgx, hx); gy = mix(gy, hgy, hx); gl2 = mix(gl2, hgl, hx);
    }
    #undef NB
    // steer by the direction field: band1 = gx*c - gy*s, band2 = gx*s + gy*c
    sx[t] = gx * dc - gy * ds;
    sy[t] = gx * ds + gy * dc;
    lap[t] = gl2;
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
${COND === 2 ? `
  if (u_condMode == 1) {
    // CPE2D: channel 0 varies with rows (y), channel 1 with cols (x);
    // rotated with the perception field like dynca.js (rotate(-u_angle))
    vec2 pemb = vec2(
      2.0 * ((float(p.y) / float(u_size.y)) - 0.5 + 0.5 / float(u_size.y)),
      2.0 * ((float(p.x) / float(u_size.x)) - 0.5 + 0.5 / float(u_size.x)));
    pemb = rotate2(-u_angle) * pemb;
    percept[${4 * C}]     = pemb.x;
    percept[${4 * C} + 1] = pemb.y;
  }` : ``}
${COND === 3 ? `
  if (u_condMode == 2) {
    // Sobel/Laplacian edge map of the grayscale content. Border uses
    // clamp-to-edge (the training-side EdgeExtractor zero-pads; differs
    // only on the outermost pixel ring).
    float g00 = contentGray(p + ivec2(-1,-1)), g01 = contentGray(p + ivec2(0,-1)), g02 = contentGray(p + ivec2(1,-1));
    float g10 = contentGray(p + ivec2(-1, 0)), g11 = contentGray(p),               g12 = contentGray(p + ivec2(1, 0));
    float g20 = contentGray(p + ivec2(-1, 1)), g21 = contentGray(p + ivec2(0, 1)), g22 = contentGray(p + ivec2(1, 1));
    float ex = -g00 + g02 - 2.*g10 + 2.*g12 - g20 + g22;
    float ey = -g00 - 2.*g01 - g02 + g20 + 2.*g21 + g22;
    percept[${4 * C}]     = ex * dc - ey * ds;
    percept[${4 * C} + 1] = ex * ds + ey * dc;
    percept[${4 * C} + 2] = g00 + 2.*g01 + g02 + 2.*g10 - 12.*g11 + 2.*g12 + g20 + 2.*g21 + g22;
  }` : ``}

  // per-pixel model select (control texture, dynca.js u_control)
  int m = int(texelFetch(u_control, p, 0).r + 0.5);
  int off1 = m * ${P + 1};
  int off2 = m * ${FC + 1};

  // dense layer 1: h = relu(W1^T percept + b1); W1 texture rows = inputs
  float hbuf[${FC}];
  for (int f = 0; f < ${FC}; f++) {
    float acc = texelFetch(u_w1, ivec2(f, off1 + ${P}), 0).r; // bias row
    for (int i = 0; i < ${P}; i++)
      acc += percept[i] * texelFetch(u_w1, ivec2(f, off1 + i), 0).r;
    hbuf[f] = max(acc, 0.0);
  }

  // dense layer 2 + stochastic residual
  ${Array.from({ length: NTEX }, (_, t) => `vec4 outv${t} = cen[${t}];`).join("\n  ")}
  for (int c = 0; c < ${C}; c++) {
    float acc = texelFetch(u_w2, ivec2(c, off2 + ${FC}), 0).r; // bias row
    for (int f = 0; f < ${FC}; f++)
      acc += hbuf[f] * texelFetch(u_w2, ivec2(c, off2 + f), 0).r;
    int t = c / 4; int k = c % 4;
    ${Array.from({ length: NTEX }, (_, t) => `if (t == ${t}) outv${t}[k] += acc * mask;`).join("\n    ")}
  }
  ${Array.from({ length: NTEX }, (_, t) => `o_state${t} = outv${t};`).join("\n  ")}
}`;
}

const DRAW_FS = `#version 300 es
precision highp float;
uniform sampler2D u_state0;
uniform float u_zoom;
uniform float u_hexGrid;
in vec2 uv;
out vec4 color;
vec2 hex2square(vec2 u) {
  // inverse of dynca.js hex2screen, as a display mapping
  float y = u.y / (1.732 / 2.0);
  return vec2(u.x - y / 2.0, y);
}
void main() {
  vec2 p = (uv - 0.5) / u_zoom + 0.5;          // center zoom (draw(zoom))
  if (u_hexGrid > 0.0) {
    vec2 q = hex2square(p - 0.5) + 0.5;
    p = mix(p, q, u_hexGrid);
  }
  vec3 rgb = texture(u_state0, fract(p)).rgb * 2.0;  // to_rgb: 3 channels x2
  color = vec4(clamp((rgb + 1.0) * 0.5, 0.0, 1.0), 1.0);
}`;

const GRAY_FS = `#version 300 es
precision highp float;
uniform sampler2D u_src;
uniform int u_mirror;
in vec2 uv;
out vec4 color;
void main() {
  vec2 p = uv;
  if (u_mirror == 1) p.x = 1.0 - p.x;   // webcam mirror (dynca.js greyscale)
  vec3 c = texture(u_src, p).rgb;
  float g = (c.r + c.g + c.b) / 3.0;   // channel-mean grayscale, in [-1,1]
  color = vec4(vec3(g * 2.0 - 1.0), 1.0);
}`;

function paintShaderSource(NTEX) {
  return `#version 300 es
precision highp float;
uniform vec2 u_pos;      // grid coords
uniform float u_r;
uniform float u_zoom;
uniform vec4 u_brush;
in vec2 uv;
${Array.from({ length: NTEX }, (_, i) => `layout(location=${i}) out vec4 o_out${i};`).join("\n")}
void main() {
  vec2 xy = gl_FragCoord.xy;
  vec2 diff = abs(xy - u_pos);
  if (length(diff) * u_zoom >= u_r) discard;
  ${Array.from({ length: NTEX }, (_, i) => `o_out${i} = u_brush;`).join("\n  ")}
}`;
}

class VSNCA {
  constructor(gl, modelJson, size, opts = {}) {
    this.gl = gl;
    this.W = size[0];
    this.H = size[1];
    this.rate = opts.updateRate ?? 0.5;
    this.padMode = { zeros: 0, replicate: 1, circular: 2 }[opts.padding ?? "circular"];
    this.exactCount = opts.exactCount ? 1 : 0;
    this.angle = 0.0;        // degrees, like dynca.js rotationAngle
    this.alignment = 0;      // 0 cartesian, 1 polar, 2 bipolar
    this.hexGrid = 0.0;
    this.mirror = opts.mirror ?? 0;  // set to 1 for webcam sources
    this.step_ = 0;

    this.nModels = countModels(modelJson);
    const l1 = detileAllModels(modelJson.layers[0], this.nModels);
    const l2 = detileAllModels(modelJson.layers[1], this.nModels);
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
    this._initSelectMask();
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
    this.paintProg = this._compile(QUAD_VS, paintShaderSource(this.NTEX));
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
    // weight textures: x = output unit, y = model*rows + input row
    this.w1Tex = this._floatTex(l1.cols, l1.nModels * l1.rows, l1.data, "R32F");
    this.w2Tex = this._floatTex(l2.cols, l2.nModels * l2.rows, l2.data, "R32F");
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
    // control texture: per-pixel model index (R32F, starts at model 0)
    this.controlTex = this._floatTex(this.W, this.H,
      new Float32Array(this.W * this.H), "R32F");
    this.controlFbo = gl.createFramebuffer();
    gl.bindFramebuffer(gl.FRAMEBUFFER, this.controlFbo);
    gl.framebufferTexture2D(gl.FRAMEBUFFER, gl.COLOR_ATTACHMENT0,
      gl.TEXTURE_2D, this.controlTex, 0);
    gl.bindFramebuffer(gl.FRAMEBUFFER, null);
  }

  _initSelectMask() {
    // Exact-count selection: exactly round(rate*N) ones, streaming
    // reservoir placement (the counting scheme of dynca.js:970-990).
    const N = this.W * this.H;
    const want = Math.round(this.rate * N);
    const sel = new Float32Array(N);
    let k = 0;
    for (let i = 0; i < N; i++) {
      if (Math.random() < (want - k) / (N - i)) {
        sel[i] = 1.0;
        k += 1;
      }
    }
    this.selectTex = this._floatTex(this.W, this.H, sel, "R32F");
    this.selCount = k;
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
    gl.uniform1i(gl.getUniformLocation(this.grayProg, "u_mirror"), this.mirror);
    gl.drawArrays(gl.TRIANGLE_STRIP, 0, 4);
    gl.bindFramebuffer(gl.FRAMEBUFFER, null);
    gl.deleteTexture(tmp);
  }

  _runPaint(fbo, nOutputs, x, y, r, brush, zoom = 1.0) {
    const gl = this.gl;
    gl.bindFramebuffer(gl.FRAMEBUFFER, fbo);
    gl.viewport(0, 0, this.W, this.H);
    gl.drawBuffers(Array.from({ length: nOutputs },
      (_, k) => gl.COLOR_ATTACHMENT0 + k));
    gl.useProgram(this.paintProg);
    gl.bindVertexArray(this.vao);
    const loc = (n) => gl.getUniformLocation(this.paintProg, n);
    gl.uniform2f(loc("u_pos"), x, y);
    gl.uniform1f(loc("u_r"), r);
    gl.uniform1f(loc("u_zoom"), zoom);
    gl.uniform4f(loc("u_brush"), brush[0], brush[1], brush[2], brush[3]);
    gl.drawArrays(gl.TRIANGLE_STRIP, 0, 4);
    gl.bindFramebuffer(gl.FRAMEBUFFER, null);
  }

  /** Brush: run model `modelIdx` inside the circle (dynca.js paint). */
  paint(x, y, r, modelIdx = 0, zoom = 1.0) {
    const m = Math.max(0, Math.min(this.nModels - 1, modelIdx));
    this._runPaint(this.controlFbo, 1, x, y, r, [m, 0, 0, 0], zoom);
  }

  /** Brush: zero the state in a circle — damage tool (dynca.js clearCircle). */
  clearCircle(x, y, r, zoom = 1.0) {
    this._runPaint(this.fbo[this.cur], this.NTEX, x, y, r, [0, 0, 0, 0], zoom);
    this._runPaint(this.fbo[1 - this.cur], this.NTEX, x, y, r, [0, 0, 0, 0], zoom);
  }

  /** Fill the control texture: the whole grid runs model `idx`. */
  setModel(idx) {
    this.paint(this.W / 2, this.H / 2, 1e9, idx);
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
    gl.uniform1i(loc("u_exactCount"), this.exactCount);
    gl.uniform1f(loc("u_angle"), this.angle * Math.PI / 180.0);
    gl.uniform1i(loc("u_alignment"), this.alignment);
    gl.uniform1f(loc("u_hexGrid"), this.hexGrid);
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
      const bind = (tex, name, unit) => {
        gl.activeTexture(gl.TEXTURE0 + unit);
        gl.bindTexture(gl.TEXTURE_2D, tex);
        gl.uniform1i(loc(name), unit);
      };
      bind(this.w1Tex, "u_w1", this.NTEX);
      bind(this.w2Tex, "u_w2", this.NTEX + 1);
      bind(this.contentTex, "u_content", this.NTEX + 2);
      bind(this.controlTex, "u_control", this.NTEX + 3);
      bind(this.selectTex, "u_select", this.NTEX + 4);
      gl.uniform1i(loc("u_step"), this.step_++);
      gl.uniform2i(loc("u_selOfs"),
        Math.floor(Math.random() * this.W), Math.floor(Math.random() * this.H));
      gl.drawArrays(gl.TRIANGLE_STRIP, 0, 4);
      this.cur = dst;
    }
    gl.bindFramebuffer(gl.FRAMEBUFFER, null);
  }

  draw(canvasW, canvasH, zoom = 1.0) {
    const gl = this.gl;
    gl.bindFramebuffer(gl.FRAMEBUFFER, null);
    gl.viewport(0, 0, canvasW, canvasH);
    gl.useProgram(this.drawProg);
    gl.bindVertexArray(this.vao);
    gl.activeTexture(gl.TEXTURE0);
    gl.bindTexture(gl.TEXTURE_2D, this.stateTex[this.cur][0]);
    gl.uniform1i(gl.getUniformLocation(this.drawProg, "u_state0"), 0);
    gl.uniform1f(gl.getUniformLocation(this.drawProg, "u_zoom"), zoom);
    gl.uniform1f(gl.getUniformLocation(this.drawProg, "u_hexGrid"), this.hexGrid);
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

if (typeof module !== "undefined")
  module.exports = { VSNCA, detileLayer, detileAllModels, stepShaderSource, paintShaderSource };
