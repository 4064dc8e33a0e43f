#!/usr/bin/env python3
"""Torch-side steering-prediction trainer over a dtown-exported dataset.

The `dowalder` fork's raison d'etre (SURVEY.md §2.16) is PyTorch
imitation / steering-prediction training driven by simulator data. dtown
generates that data fully on device (scripts/gen_data.py -> .npz); this
script is the torch half of that pipeline for users migrating from the
fork: a CNN (rgb) or MLP (state) regressor trained with MSE on expert
[velocity, steering] actions, CPU torch (the baked-in build).

The JAX-native equivalent (faster, on-device end to end) is
scripts/train_imitation.py; this exists as the torch interop surface.

Usage:
  python scripts/gen_data.py --cpu --map small_loop --envs 64 \
      --steps 100 --obs state --out /tmp/demos.npz
  python scripts/train_torch_bc.py --data /tmp/demos.npz --epochs 5
Prints one JSON line per epoch and a final summary line.
"""
from __future__ import annotations

import argparse
import json
import sys


def build_model(obs_shape, torch):
    nn = torch.nn
    if len(obs_shape) == 3:  # H, W, C uint8 image
        H, W, C = obs_shape

        class Net(nn.Module):
            def __init__(self):
                super().__init__()
                self.conv = nn.Sequential(
                    nn.Conv2d(C, 32, 8, stride=4), nn.ReLU(),
                    nn.Conv2d(32, 64, 4, stride=2), nn.ReLU(),
                    nn.Conv2d(64, 64, 3, stride=1), nn.ReLU(),
                    nn.Flatten(),
                )
                with torch.no_grad():
                    n = self.conv(torch.zeros(1, C, H, W)).shape[1]
                self.head = nn.Sequential(
                    nn.Linear(n, 256), nn.ReLU(), nn.Linear(256, 2)
                )

            def forward(self, x):
                # uint8 HWC -> f32 CHW in [0,1]
                x = x.permute(0, 3, 1, 2).float() / 255.0
                return self.head(self.conv(x))

        return Net()

    class Mlp(nn.Module):
        def __init__(self):
            super().__init__()
            self.net = nn.Sequential(
                nn.Linear(int(obs_shape[0]), 128), nn.Tanh(),
                nn.Linear(128, 128), nn.Tanh(), nn.Linear(128, 2)
            )

        def forward(self, x):
            return self.net(x.float())

    return Mlp()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", required=True, help=".npz from gen_data.py")
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--val-frac", type=float, default=0.1)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default=None, help="save state_dict (.pt)")
    args = ap.parse_args()

    import numpy as np
    import torch

    torch.manual_seed(args.seed)
    d = np.load(args.data, allow_pickle=True)
    obs, act = d["obs"], d["act"].astype(np.float32)
    n = len(obs)
    rng = np.random.default_rng(args.seed)
    perm = rng.permutation(n)
    n_val = max(1, int(n * args.val_frac))
    vi, ti = perm[:n_val], perm[n_val:]
    if len(ti) == 0:
        sys.exit(f"dataset too small for --val-frac {args.val_frac}: "
                 f"{n} samples leave an empty training split")

    model = build_model(obs.shape[1:], torch)
    opt = torch.optim.Adam(model.parameters(), lr=args.lr)
    obs_t = torch.from_numpy(obs)
    act_t = torch.from_numpy(act)

    def mse(idx):
        with torch.no_grad():
            pred = model(obs_t[idx])
            return float(((pred - act_t[idx]) ** 2).mean())

    first_val = mse(vi)
    for ep in range(args.epochs):
        order = rng.permutation(ti)
        tot, nb = 0.0, 0
        for s in range(0, len(order), args.batch):
            idx = order[s:s + args.batch]
            pred = model(obs_t[idx])
            loss = ((pred - act_t[idx]) ** 2).mean()
            opt.zero_grad()
            loss.backward()
            opt.step()
            tot += float(loss)
            nb += 1
        print(json.dumps({"epoch": ep, "train_mse": round(tot / nb, 5),
                          "val_mse": round(mse(vi), 5)}))
    final_val = mse(vi)
    if args.out:
        torch.save(model.state_dict(), args.out)
    print(json.dumps({"final_val_mse": round(final_val, 5),
                      "first_val_mse": round(first_val, 5),
                      "improved": final_val < first_val,
                      "saved": args.out}))
    return 0 if final_val < first_val else 1


if __name__ == "__main__":
    sys.exit(main())
