"""Throughput benchmark: megapixels/sec of the batched optimizer at -s 19.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline (BASELINE.json north star): 10,000 1MP-images/sec on v5e-8,
i.e. 1,250 1MP-images/sec/chip — vs_baseline is measured against the
per-chip share so the number is honest on a single chip.

Measurement: DEVICE compute rate by dispatch slopes — k back-to-back
dispatches of the production program whose outputs are sum-reduced on
device (so fetches are scalars), timed as slope = (t(1+n) - t(1)) / n;
the minimum over several trials rejects the dev box's tunnel noise.

Why slopes: this box reaches its single v5e chip through an experimental
HTTP tunnel that (a) serializes host<->device transfers at ~20 MB/s and
(b) does not honor block_until_ready, so any wall-clock measurement of a
dispatch+fetch measures the tunnel, not the chip. The slope isolates the
chip. The full streaming rate through dispatch_buckets/collect_bucket
(which on this box is tunnel-transfer-bound at ~6.3 MB per megapixel) is
also measured once and reported on stderr for transparency; on normally
attached hardware (PCIe host) the two converge.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from pngloss_tpu import codec
    from pngloss_tpu.ops import optimize_batch_auto
    from pngloss_tpu.pipeline import (
        collect_bucket,
        dispatch_buckets,
        reduce_colorspace,
    )

    strength = int(os.environ.get("PNGLOSS_BENCH_STRENGTH", "19"))

    # lena.png: 512x512 RGB — the reference's headline benchmark image
    lena = open("/root/reference/suite/lena.png", "rb").read()
    work, bpp = reduce_colorspace(codec.decode(lena).rgba)
    rng = np.random.default_rng(0)

    # ---- device rate by dispatch slopes (one VMEM-quantum chunk) ----
    chunk_b = 25
    batch = np.stack([work] * chunk_b)
    # perturb a stripe so batch lanes aren't value-identical
    batch[:, :, : 4 * bpp] = rng.integers(
        0, 256, (chunk_b, work.shape[0], 4 * bpp), np.uint8)
    chunk_mp = chunk_b * work.shape[0] * (work.shape[1] // bpp) / 1e6

    from pngloss_tpu.ops.optimize import band_pad_for

    def once():
        q, f = optimize_batch_auto(batch, strength, 2, bpp=bpp,
                                   band_pad=band_pad_for(strength))
        return jnp.sum(q.astype(jnp.int32)) + jnp.sum(f.astype(jnp.int32))

    t0 = time.time()
    float(once())            # compile + tunnel warmup
    compile_s = time.time() - t0

    def timed(k):
        t0 = time.time()
        vals = [once() for _ in range(k)]
        _ = [float(v) for v in vals]
        return time.time() - t0

    trials = int(os.environ.get("PNGLOSS_BENCH_TRIALS", "7"))
    slopes = []
    for _ in range(trials):
        t1 = timed(1)
        t4 = timed(4)
        slopes.append((t4 - t1) / 3)
    slope = min(slopes)
    device_mp_s = chunk_mp / slope

    # ---- end-to-end stream rate through the production pipeline ----
    batch_n = int(os.environ.get("PNGLOSS_BENCH_BATCH", "100"))
    works, bpps = [], []
    for _ in range(batch_n):
        w = work.copy()
        w[:, : 4 * bpp] = rng.integers(
            0, 256, (w.shape[0], 4 * bpp), np.uint8)
        works.append(w)
        bpps.append(bpp)
    stream_mp = batch_n * work.shape[0] * (work.shape[1] // bpp) / 1e6
    t0 = time.time()
    for p in dispatch_buckets(works, bpps, strength):
        collect_bucket(p)
    stream_s = time.time() - t0
    stream_mp_s = stream_mp / stream_s

    # baseline: 10k 1MP img/s across 8 chips -> 1250 MP/s/chip
    per_chip_target = 10000.0 / 8.0
    n_chips = max(1, len(jax.devices()))
    value = device_mp_s / n_chips
    print(json.dumps({
        "metric": "1mp_images_per_sec_per_chip",
        "value": round(value, 3),
        "unit": "img(1MP)/s/chip",
        "vs_baseline": round(value / per_chip_target, 4),
    }))
    print(f"# device slope: min={slope:.3f}s/chunk over {trials} trials "
          f"(all: {[round(s, 3) for s in sorted(slopes)]}) "
          f"chunk={chunk_mp:.2f}MP compile+first={compile_s:.1f}s",
          file=sys.stderr)
    print(f"# stream (tunnel-transfer-bound on this box): "
          f"{stream_mp:.1f}MP in {stream_s:.2f}s = {stream_mp_s:.2f} MP/s; "
          f"devices={n_chips}", file=sys.stderr)


if __name__ == "__main__":
    main()
