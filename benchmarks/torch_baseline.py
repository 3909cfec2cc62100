"""Torch-CPU reference-equivalent baseline for the flagship stage-3a train
step (the BASELINE.json parity config: "lifter+flow train step").

The reference repo itself is not runnable here (FrEIA is not installed and
its imports are broken — SURVEY.md §2.9), so this module reimplements the
same computation in torch at the same sizes: two 11-joint residual-MLP
lifters (models_def.py topology), three frozen 8-block coupling flows, the
sample-augmented rotation/reprojection loss set, and two Adam updates per
step at fp32 on CPU. bench.py measures it once and caches the poses/sec.

This is deliberately independent code (same math, own structure) — see the
reference citations in links_tpu/objectives/lifter.py for the semantics.
"""

from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn as nn

LEFT_IDX = [0, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13]
RIGHT_IDX = [0, 1, 2, 3, 7, 8, 9, 10, 14, 15, 16]
COMBINE_COL = [0, 1, 2, 3, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 8, 9, 10]
FROM_RIGHT = {
    "left": torch.tensor([0, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1], dtype=torch.bool),
    "right": torch.tensor([1, 1, 1, 1, 0, 0, 0, 1, 1, 1, 1, 0, 0, 0, 1, 1, 1], dtype=torch.bool),
}
BONE_MAP = [[0, 1], [1, 2], [2, 3], [0, 4], [4, 5], [5, 6], [0, 7], [7, 8],
            [8, 9], [9, 10], [8, 11], [11, 12], [12, 13], [8, 14], [14, 15], [15, 16]]
BONE_MEANS = torch.tensor([0.5180581, 1.73711136, 1.72285805, 0.5180552, 1.73710543,
                           1.72285651, 0.92087518, 0.98792375, 0.44812302, 0.44502545,
                           0.57462, 1.08121276, 0.9651687, 0.57461556, 1.08122523,
                           0.9651657])


class ResBlock(nn.Module):
    def __init__(self, n=1024):
        super().__init__()
        self.l1, self.l2 = nn.Linear(n, n), nn.Linear(n, n)

    def forward(self, x):
        act = nn.functional.leaky_relu
        return act(self.l2(act(self.l1(x)))) + x


class Lifter(nn.Module):
    def __init__(self, nj=11):
        super().__init__()
        self.up = nn.Linear(2 * nj, 1024)
        self.common = ResBlock()
        self.pose = nn.ModuleList([ResBlock() for _ in range(3)])
        self.angle = nn.ModuleList([ResBlock() for _ in range(3)])
        self.down = nn.Linear(1024, nj)
        self.ang = nn.Linear(1024, 1)

    def forward(self, x):
        act = nn.functional.leaky_relu
        h = act(self.common(self.up(x)))
        xd, xa = h, h
        for blk in self.pose:
            xd = act(blk(xd))
        for blk in self.angle:
            xa = act(blk(xa))
        return self.down(xd), self.ang(xa)


class CouplingBlock(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.len1 = dim - dim // 2
        self.len2 = dim // 2
        self.net = nn.Sequential(nn.Linear(self.len1, 1024), nn.ReLU(),
                                 nn.Linear(1024, 2 * self.len2))
        q, _ = torch.linalg.qr(torch.randn(dim, dim))
        self.register_buffer("w", q)
        self.gs = nn.Parameter(torch.full((dim,), 2.0 * math.log(math.exp(5.0) - 1.0)))
        self.gb = nn.Parameter(torch.zeros(dim))

    def forward(self, x):
        x1, x2 = x[:, : self.len1], x[:, self.len1:]
        a = self.net(x1) * 0.1
        s = 2.0 * 0.636 * torch.atan(a[:, : self.len2])  # FrEIA's literal 0.636
        y2 = x2 * torch.exp(s) + a[:, self.len2:]
        gs = 0.1 * (2.0 * torch.log1p(torch.exp(0.5 * self.gs)))
        y = torch.cat([x1, y2], 1) * gs + self.gb
        return y @ self.w.T, s.sum(1) + torch.log(gs).sum()

    def inverse(self, z):
        gs = 0.1 * (2.0 * torch.log1p(torch.exp(0.5 * self.gs)))
        y = (z @ self.w - self.gb) / gs
        x1, y2 = y[:, : self.len1], y[:, self.len1:]
        a = self.net(x1) * 0.1
        s = 2.0 * 0.636 * torch.atan(a[:, : self.len2])  # FrEIA's literal 0.636
        x2 = (y2 - a[:, self.len2:]) * torch.exp(-s)
        return torch.cat([x1, x2], 1)


class FlowSeq(nn.Module):
    def __init__(self, dim, k=8):
        super().__init__()
        self.blocks = nn.ModuleList([CouplingBlock(dim) for _ in range(k)])

    def forward(self, x):
        ld = torch.zeros(x.shape[0])
        for b in self.blocks:
            x, j = b(x)
            ld = ld + j
        return x, ld

    def inverse(self, z):
        for b in reversed(self.blocks):
            z = b.inverse(z)
        return z


def _split_lr(x):
    p = x.reshape(-1, 2, 17)
    return (p[:, :, LEFT_IDX].reshape(-1, 22), p[:, :, RIGHT_IDX].reshape(-1, 22))


def _combine_1d(left, right, choice):
    l = left.reshape(-1, 1, 11)[:, :, COMBINE_COL]
    r = right.reshape(-1, 1, 11)[:, :, COMBINE_COL]
    return torch.where(FROM_RIGHT[choice], r, l).reshape(-1, 17)


def _rot_x(a):
    c, s = torch.cos(a[:, 0]), torch.sin(a[:, 0])
    z, o = torch.zeros_like(c), torch.ones_like(c)
    return torch.stack([o, z, z, z, c, -s, z, s, c], -1).reshape(-1, 3, 3)


def _rot_y(a):
    c, s = torch.cos(a[:, 0]), torch.sin(a[:, 0])
    z, o = torch.zeros_like(c), torch.ones_like(c)
    return torch.stack([c, z, s, z, o, z, -s, z, c], -1).reshape(-1, 3, 3)


def _reconstruct(p2d, depth):
    p = p2d.reshape(-1, 2, 17)
    xyz = torch.cat([p * depth[:, None, :], depth[:, None, :]], 1)
    return xyz - xyz[:, :, 0:1]


def _project(p51, d):
    xy = p51[:, :34].reshape(-1, 2, 17)
    z = p51[:, 34:].reshape(-1, 1, 17) + d
    return (xy / z).reshape(-1, 34)


def _bl_prior(p3d):
    p = p3d.reshape(-1, 3, 17)
    bm = torch.tensor(BONE_MAP)
    bones = p[:, :, bm[:, 0]] - p[:, :, bm[:, 1]]
    bl = bones.norm(dim=1)
    rel = bl / bl.mean(dim=1, keepdim=True)
    return (BONE_MEANS - rel).square().sum(1).mean()


class BaselineStep:
    """One reference-equivalent stage-3a train step on torch CPU."""

    def __init__(self, depth=10.0, seed=0):
        torch.manual_seed(seed)
        self.depth = depth
        self.left = Lifter()
        self.right = Lifter()
        self.full_flow = FlowSeq(34)
        self.left_flow = FlowSeq(22)
        self.right_flow = FlowSeq(22)
        for m in (self.full_flow, self.left_flow, self.right_flow):
            for p in m.parameters():
                p.requires_grad_(False)
        self.opt_l = torch.optim.Adam(self.left.parameters(), lr=2e-4, weight_decay=1e-5)
        self.opt_r = torch.optim.Adam(self.right.parameters(), lr=2e-4, weight_decay=1e-5)

    def __call__(self, inp):
        self.opt_l.zero_grad()
        self.opt_r.zero_grad()
        with torch.no_grad():
            z, _ = self.full_flow(inp)
            z = z + 0.2 * torch.randn_like(z) * z
            samples = self.full_flow.inverse(z).reshape(-1, 2, 17)
            samples[:, :, 0] = 0.0
            inp = torch.cat([inp, samples.reshape(-1, 34)], 0)
        n = inp.shape[0]
        li, ri = _split_lr(inp)
        lp, la = self.left(li)
        rp, ra = self.right(ri)
        props = (la + ra) / 2
        pl = _combine_1d(lp, rp, "left")
        pr = _combine_1d(lp, rp, "right")
        pl = torch.cat([torch.zeros(n, 1), pl[:, 1:]], 1)
        pr = torch.cat([torch.zeros(n, 1), pr[:, 1:]], 1)
        r_comp = _rot_x(props)
        x_ang = -props.mean() + props.std() * torch.randn(n, 1)
        y_ang = (torch.rand(n, 1) - 0.5) * 1.99 * math.pi
        R = _rot_x(x_ang) @ (_rot_y(y_ang) @ r_comp)
        dl = torch.clamp(pl + self.depth, min=1.0)
        dr = torch.clamp(pr + self.depth, min=1.0)
        p3l = _reconstruct(inp, dl)
        p3r = _reconstruct(inp, dr)
        rl = (R @ p3l).reshape(n, 51)
        rr = (R @ p3r).reshape(n, 51)
        r2l = _project(rl, self.depth)
        r2r = _project(rr, self.depth)
        nls, _ = _split_lr(r2l)
        _, nrs = _split_lr(r2r)
        zl, ldl = self.left_flow(nls)
        zr, ldr = self.right_flow(nrs)
        likeli = (0.5 * (zl**2).sum(1) - ldl).mean() + (0.5 * (zr**2).sum(1) - ldr).mean()
        lp2, _ = self.left(nls)
        rp2, _ = self.right(nrs)
        pfl = _combine_1d(lp2, rp2, "left")
        pfr = _combine_1d(lp2, rp2, "right")
        pfl = torch.cat([torch.zeros(n, 1), pfl[:, 1:]], 1)
        pfr = torch.cat([torch.zeros(n, 1), pfr[:, 1:]], 1)
        dfl = torch.clamp(pfl + self.depth, min=1.0)
        dfr = torch.clamp(pfr + self.depth, min=1.0)
        p3rl = _reconstruct(r2l, dfl)
        p3rr = _reconstruct(r2r, dfr)
        L3d = (rr - p3rr.reshape(n, 51)).norm(dim=1).mean() + \
              (rl - p3rl.reshape(n, 51)).norm(dim=1).mean()
        rrl = (R.transpose(1, 2) @ p3rl).reshape(n, 51)
        rrr = (R.transpose(1, 2) @ p3rr).reshape(n, 51)
        rep = (_project(rrl, self.depth) - inp).abs().sum(1).mean() + \
              (_project(rrr, self.depth) - inp).abs().sum(1).mean()
        npair = n // 2
        def pair(x):
            return x.reshape(-1, 51)[: 2 * npair].reshape(-1, 2, 51)
        defo = ((pair(p3l)[:, 0] - pair(p3l)[:, 1]) - (pair(rrl)[:, 0] - pair(rrl)[:, 1])
                ).norm(dim=1).mean() + \
               ((pair(p3r)[:, 0] - pair(p3r)[:, 1]) - (pair(rrr)[:, 0] - pair(rrr)[:, 1])
                ).norm(dim=1).mean()
        bl = _bl_prior(p3l) + _bl_prior(p3r)
        loss = likeli + rep + L3d + defo + 50.0 * bl
        loss.backward()
        self.opt_l.step()
        self.opt_r.step()
        return float(loss.detach())


def measure_poses_per_sec(batch_size=256, steps=6, warmup=2, seed=0,
                          repeats=3):
    """Steady-state poses/sec of the torch-CPU baseline step (poses counted
    as loader batch rows, matching the TPU measurement). Best of
    ``repeats`` timed windows — the same policy as the TPU side's
    best-of-REPEATS (bench.py), so a transient stall in one window cannot
    bias the vs_baseline ratio either way."""
    import time

    rng = np.random.default_rng(seed)
    step = BaselineStep(seed=seed)
    poses = rng.normal(size=(batch_size, 2, 17)).astype(np.float32) * 0.1
    poses[:, :, 0] = 0.0
    batch = torch.tensor(poses.reshape(batch_size, 34))
    for _ in range(warmup):
        step(batch)
    best = 0.0
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(steps):
            step(batch)
        dt = time.perf_counter() - t0
        best = max(best, batch_size * steps / dt)
    return best
