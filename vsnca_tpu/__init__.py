"""vsnca_tpu — TPU-native neural-cellular-automata video stylization framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
smehra34/Video-Stylization-with-NCA (see SURVEY.md for the blueprint):

- ``models``   — NCA cells (DyNCA, ConditionedNCA), ImageEncoder, frozen
  feature extractors (VGG16, MSOE two-stream motion net).
- ``ops``      — fixed-filter perception stencils, positional encodings,
  resize/grid-sample primitives, and the fused Pallas step kernel.
- ``losses``   — appearance (Gram/OT/SlW), content, auxiliary, overflow,
  vector-field motion, video motion, style consistency; a registry
  orchestrator mirrors the reference's Loss (ExtraChannels/utils/loss/loss.py).
- ``pool``     — device-resident sample pool with seed injection.
- ``train``    — jitted train steps, grad-normalized Adam, LR schedules, CLIs.
- ``data``     — image/video preprocessing, vector-field library.
- ``infer``    — persistent-state video stylizer + benchmark harness.
- ``export``   — orbax checkpoints + WebGL-compatible JSON export.
- ``parallel`` — jax.sharding Mesh utilities: data-parallel train steps and
  spatially sharded (halo-exchange) rollouts.

Everything is functional: model parameters are pytrees (plain dicts), steps
are pure functions, randomness is keyed, and rollouts are ``lax.scan`` with
rematerialization for O(1) BPTT memory.

Layout convention: images and NCA states are NHWC (``[B, H, W, C]``) so the
channel dimension maps to TPU lanes. Helpers for NCHW interop live in
``vsnca_tpu.utils``.
"""

__version__ = "0.1.0"
