"""Compile-cache prewarm (round-3 verdict item 8).

First compiles of new program shapes go through the TPU tunnel (1-6 min
each); BENCH_r03's compile+first was 306 s because round 3 introduced new
shapes. This tool compiles the production (shape, bpp, wmax-class)
program set into the persistent XLA cache (compile_cache.py,
~/.cache/pngloss_tpu/xla-cache) so driver bench captures and first
production runs start warm: a second `python bench.py` in a fresh
process should then show compile+first well under a minute.

Programs warmed:
  * bench.py's exact slope programs (lena chunk, k=1 and k=4, -s 19)
  * the suite's shape buckets for the wmax classes in --strengths
    (default 0,19,40 — the headline configs; pass 0-255 sweeps all)

Usage:
  python tools/prewarm.py                 # bench + default suite shapes
  python tools/prewarm.py --bench-only
  python tools/prewarm.py --strengths 0,19,40,75,200
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--bench-only", action="store_true")
    ap.add_argument("--strengths", default="0,19,40")
    ap.add_argument("--suite-dir", default="/root/reference/suite")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pngloss_tpu import codec
    from pngloss_tpu.ops.optimize_pallas import wmax_class_for
    from pngloss_tpu.pipeline import reduce_colorspace

    t_start = time.time()
    warmed = []

    # --- bench.py's exact programs: same builder => same trace => same
    # persistent-cache key (bench.make_bench_batch / make_slope_prog) ---
    import bench

    batch, bpp, _ = bench.make_bench_batch(suite_dir=args.suite_dir)
    strength = int(os.environ.get("PNGLOSS_BENCH_STRENGTH", "19"))
    batch_dev = jax.device_put(jnp.asarray(batch))
    run_k = bench.make_slope_prog(batch_dev, strength, bpp)

    for k in (1, 4):
        t0 = time.time()
        run_k(k)
        warmed.append({"prog": f"bench k={k}", "shape": list(batch.shape),
                       "s": time.time() - t0})
        print(f"# bench k={k}: {warmed[-1]['s']:.1f}s", file=sys.stderr)

    # --- suite shape buckets per wmax class ---
    if not args.bench_only:
        from pngloss_tpu.pipeline import collect_bucket, dispatch_buckets

        strengths = [int(s) for s in args.strengths.split(",")]
        classes = {}
        for s in strengths:
            classes.setdefault(wmax_class_for(s), s)
        files = sorted(
            f for f in os.listdir(args.suite_dir) if f.endswith(".png"))
        works, bpps = [], []
        for f in files:
            try:
                im = codec.decode(
                    open(os.path.join(args.suite_dir, f), "rb").read())
            except codec.PngDecodeError:
                continue
            w, bp = reduce_colorspace(im.rgba)
            works.append(w)
            bpps.append(bp)
        for wclass, s in sorted(classes.items()):
            t0 = time.time()
            for p in dispatch_buckets(works, bpps, s):
                collect_bucket(p)
            warmed.append({"prog": f"suite wmax-class {wclass} (s={s})",
                           "s": time.time() - t0})
            print(f"# suite class {wclass}: {warmed[-1]['s']:.1f}s",
                  file=sys.stderr)

    print(json.dumps({"prewarmed": warmed,
                      "total_s": round(time.time() - t_start, 1),
                      "backend": jax.default_backend()}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
