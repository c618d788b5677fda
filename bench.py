"""Throughput benchmark: megapixels/sec of the batched optimizer at -s 19.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline (BASELINE.json north star): 10,000 1MP-images/sec on v5e-8,
i.e. 1,250 1MP-images/sec/chip — vs_baseline is measured against the
per-chip share so the number is honest on a single chip.

Measurement: STEADY-STATE streaming rate through the production dispatch
path (pipeline.dispatch_buckets / collect_bucket) — K VMEM-quantum chunks
are dispatched asynchronously, device→host copies stream concurrently,
and the wall clock covers the whole drained stream. One warmup
dispatch+fetch first (compile + tunnel warmup), reported on stderr.
A one-shot dispatch+blocking-fetch timing on this box measures the TPU
tunnel's ~5 MB/s serial fetch path, not the kernel (see BASELINE.md).
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
    from pngloss_tpu.pipeline import (
        collect_bucket,
        dispatch_buckets,
        reduce_colorspace,
    )

    batch = int(os.environ.get("PNGLOSS_BENCH_BATCH", "200"))
    strength = int(os.environ.get("PNGLOSS_BENCH_STRENGTH", "19"))

    # lena.png: 512x512 RGB — the reference's headline benchmark image
    lena = open("/root/reference/suite/lena.png", "rb").read()
    work, bpp = reduce_colorspace(codec.decode(lena).rgba)
    rng = np.random.default_rng(0)
    works = []
    for i in range(batch):
        w = work.copy()
        # perturb a stripe so batches aren't value-identical
        w[:, : 4 * bpp] = rng.integers(0, 256, (w.shape[0], 4 * bpp), np.uint8)
        works.append(w)
    bpps = [bpp] * batch
    mp = batch * work.shape[0] * (work.shape[1] // bpp) / 1e6

    t0 = time.time()
    warm = min(batch, 25)   # one full VMEM-quantum chunk (compiles the
    # same program the stream uses; B pads to the quantum size class)
    for p in dispatch_buckets(works[:warm], bpps[:warm], strength):
        collect_bucket(p)
    compile_s = time.time() - t0

    t0 = time.time()
    pending = dispatch_buckets(works, bpps, strength)
    for p in pending:
        collect_bucket(p)
    elapsed = time.time() - t0
    mp_per_s = mp / elapsed

    # baseline: 10k 1MP img/s across 8 chips -> 1250 MP/s/chip
    per_chip_target = 10000.0 / 8.0
    n_chips = max(1, len(jax.devices()))
    print(json.dumps({
        "metric": "1mp_images_per_sec_per_chip",
        "value": round(mp_per_s / n_chips, 3),
        "unit": "img(1MP)/s/chip",
        "vs_baseline": round(mp_per_s / n_chips / per_chip_target, 4),
    }))
    print(f"# batch={batch} strength={strength} chunks={len(pending)} "
          f"stream={elapsed:.3f}s compile+first={compile_s:.1f}s "
          f"devices={n_chips}", file=sys.stderr)


if __name__ == "__main__":
    main()
