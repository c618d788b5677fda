"""Throughput benchmark: megapixels/sec of the batched optimizer at -s 19.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline (BASELINE.json north star): 10,000 1MP-images/sec on v5e-8,
i.e. 1,250 1MP-images/sec/chip — vs_baseline is measured against the
per-chip share so the number is honest on a single chip.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def main() -> None:
    import jax

    from pngloss_tpu import codec
    from pngloss_tpu.ops import optimize_batch_auto
    from pngloss_tpu.pipeline import reduce_colorspace

    batch = int(os.environ.get("PNGLOSS_BENCH_BATCH", "64"))
    strength = int(os.environ.get("PNGLOSS_BENCH_STRENGTH", "19"))
    impl = os.environ.get("PNGLOSS_BENCH_IMPL", "auto")

    # lena.png: 512x512 RGB — the reference's headline benchmark image
    lena = open("/root/reference/suite/lena.png", "rb").read()
    work, bpp = reduce_colorspace(codec.decode(lena).rgba)
    rows = np.broadcast_to(work, (batch,) + work.shape).copy()
    mp = batch * work.shape[0] * (work.shape[1] // bpp) / 1e6

    t0 = time.time()
    q, f = optimize_batch_auto(rows, strength, 2, bpp=bpp, impl=impl)
    np.asarray(q)
    compile_s = time.time() - t0

    times = []
    for _ in range(3):
        t0 = time.time()
        q, f = optimize_batch_auto(rows, strength, 2, bpp=bpp, impl=impl)
        np.asarray(q)
        times.append(time.time() - t0)
    best = min(times)

    mp_per_s = mp / best
    # baseline: 10k 1MP img/s across 8 chips -> 1250 MP/s/chip
    per_chip_target = 10000.0 / 8.0
    n_chips = max(1, len(jax.devices()))
    print(json.dumps({
        "metric": "1mp_images_per_sec_per_chip",
        "value": round(mp_per_s / n_chips, 3),
        "unit": "img(1MP)/s/chip",
        "vs_baseline": round(mp_per_s / n_chips / per_chip_target, 4),
    }))
    print(f"# batch={batch} strength={strength} best={best:.3f}s "
          f"compile+first={compile_s:.1f}s devices={n_chips}", file=sys.stderr)


if __name__ == "__main__":
    main()
