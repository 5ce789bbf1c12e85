#!/usr/bin/env python
"""PyTorch-CPU baseline for the training-step throughput comparison
(BASELINE.md: ">= 20x PyTorch-CPU reference").

A minimal, freshly written torch training step with the same workload shape
as our `static_texture` preset: DyNCA cell (fixed Sobel/Laplacian depthwise
perception + two 1x1 convs + stochastic mask), 64-step BPTT rollout at
128px batch 4, random-weight VGG16 Gram style loss, per-parameter grad
normalization + Adam. Mirrors the reference pipeline's structure
(ConditioneDyNCA/experiments.py) without copying its code.

Run: python scripts/bench_torch_cpu.py [iters]
"""

import sys
import time

import numpy as np
import torch
import torch.nn.functional as F

torch.manual_seed(0)

C_IN, FC, SIZE, BATCH, STEPS = 12, 96, 128, 4, 64

SOBEL_X = torch.tensor([[-1.0, 0, 1], [-2, 0, 2], [-1, 0, 1]])
SOBEL_Y = SOBEL_X.T.clone()
LAP = torch.tensor([[1.0, 2, 1], [2, -12, 2], [1, 2, 1]])


class DyNCA(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.w1 = torch.nn.Conv2d(4 * C_IN + 2, FC, 1)
        self.w2 = torch.nn.Conv2d(FC, C_IN, 1)
        # reference init (dynca.py:60-65): Xavier-normal gains 0.2 / 0.1,
        # zero w2 bias — torch's default init makes the rollout diverge
        torch.nn.init.xavier_normal_(self.w1.weight, gain=0.2)
        torch.nn.init.xavier_normal_(self.w2.weight, gain=0.1)
        torch.nn.init.zeros_(self.w2.bias)
        ys = torch.linspace(-1, 1, SIZE)
        self.register_buffer(
            "cpe",
            torch.stack(torch.meshgrid(ys, ys, indexing="ij"))[None].repeat(
                BATCH, 1, 1, 1
            ),
        )

    def perceive(self, x):
        filt = torch.stack([SOBEL_X, SOBEL_Y, LAP])[:, None]  # [3,1,3,3]
        w = filt.repeat(C_IN, 1, 1, 1)
        z = F.pad(x, [1, 1, 1, 1], "circular")
        y = F.conv2d(z, w, groups=C_IN)
        return torch.cat([x, y], 1)

    def forward(self, x):
        p = torch.cat([self.perceive(x), self.cpe], 1)
        dx = self.w2(F.relu(self.w1(p)))
        mask = torch.floor(torch.rand(x.shape[0], 1, SIZE, SIZE) + 0.5)
        return x + dx * mask


def make_vgg():
    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M"]
    layers, c_in = [], 3
    for v in cfg:
        if v == "M":
            layers.append(torch.nn.MaxPool2d(2, 2))
        else:
            layers += [torch.nn.Conv2d(c_in, v, 3, padding=1), torch.nn.ReLU()]
            c_in = v
    return torch.nn.Sequential(*layers).eval()


def gram_loss(vgg, gen, tgt_feats):
    taps = [1, 6, 11, 18, 25]
    x = gen
    loss = 0.0
    feats = []
    for i, layer in enumerate(vgg[: max(taps) + 1]):
        x = layer(x)
        if i in taps:
            feats.append(x)
    for f, tf in zip(feats, tgt_feats):
        b, c, h, w = f.shape
        g = (f.reshape(b, c, -1) @ f.reshape(b, c, -1).transpose(1, 2)) / (h * w)
        loss = loss + (g - tf).square().mean()
    return loss


def measure(iters: int = 3) -> float:
    """Return seconds per training iteration (importable from bench.py)."""
    model = DyNCA()
    vgg = make_vgg()
    for p in vgg.parameters():
        p.requires_grad_(False)
    opt = torch.optim.Adam(model.parameters(), lr=1e-3)
    style = torch.rand(BATCH, 3, SIZE, SIZE)

    with torch.no_grad():
        taps = [1, 6, 11, 18, 25]
        x = style
        tgt_feats = []
        for i, layer in enumerate(vgg[: max(taps) + 1]):
            x = layer(x)
            if i in taps:
                b, c, h, w = x.shape
                tgt_feats.append(
                    (x.reshape(b, c, -1) @ x.reshape(b, c, -1).transpose(1, 2))
                    / (h * w)
                )

    state = torch.zeros(BATCH, C_IN, SIZE, SIZE)

    def train_iter(state):
        s = state
        for _ in range(STEPS):
            s = model(s)
        rgb = (s[:, :3] * 2.0 + 1.0) / 2.0
        # overflow loss (weight 100) exactly like the static_texture preset:
        # without it the unconstrained state diverges over the 64-step BPTT
        overflow = (s - s.clamp(-1.0, 1.0)).abs().mean()
        loss = gram_loss(vgg, rgb, tgt_feats) + 100.0 * overflow
        opt.zero_grad()
        loss.backward()
        for p in model.parameters():
            p.grad /= p.grad.norm() + 1e-8
        opt.step()
        return s.detach(), float(loss)

    state, _ = train_iter(state)  # warm
    # MEDIAN of per-iteration times, not the mean: this runs on a shared
    # box whose load swings the torch number +-2x run-to-run (BENCH_r04
    # 7.39 s/iter vs a same-day 14.64 — VERDICT r4 weak #3); the median
    # rejects the one iteration that landed on a load spike.
    times = []
    for _ in range(iters):
        t0 = time.time()
        state, loss = train_iter(state)
        times.append(time.time() - t0)
    dt = float(np.median(times))
    print(
        f"torch-cpu: median {dt:.2f} s/iter of {[round(t, 2) for t in times]} "
        f"({1/dt:.3f} it/s) "
        f"[{SIZE}px batch {BATCH}, {STEPS}-step BPTT, Gram loss] loss={loss:.4f}"
    )
    return dt


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    measure(iters)


if __name__ == "__main__":
    main()
