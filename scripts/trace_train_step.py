"""Op-level device trace of the composed GAN train step.

The round-2/3 mystery: isolated components sum to ~97 ms while the
composed donated-params step runs ~225 ms (PERFORMANCE.md).  This
captures a real device trace of a few composed steps via
``jax.profiler`` and aggregates per-op device time from the xplane
proto, so the gap can be attributed to actual ops instead of
hypotheses (weight-norm recompute, runtime weight-layout transposes,
optimizer traffic, ...).

Usage: python scripts/trace_train_step.py [batch] [--s2d] [--disc_bf16]
       [--trunk_bf16] [--top N]
"""
import glob
import os
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def parse_xplanes(trace_dir, top=40):
    """Aggregate device-plane op durations from the newest xplane.pb."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                             recursive=True), key=os.path.getmtime)
    if not paths:
        print("no xplane.pb produced — device tracing unsupported here")
        return
    space = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        space.ParseFromString(f.read())

    print(f"planes: {[p.name for p in space.planes]}")
    for plane in space.planes:
        name = plane.name.lower()
        if not ("tpu" in name or "device" in name or "xla ops" in name):
            continue
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        totals = {}
        counts = {}
        for line in plane.lines:
            for ev in line.events:
                nm = ev_meta.get(ev.metadata_id, str(ev.metadata_id))
                totals[nm] = totals.get(nm, 0) + ev.duration_ps
                counts[nm] = counts.get(nm, 0) + 1
        if not totals:
            continue
        grand = sum(totals.values())
        print(f"\n=== plane: {plane.name} (lines={len(plane.lines)}, "
              f"total {grand/1e12*1e3:.1f} ms) ===")
        for nm, ps in sorted(totals.items(), key=lambda kv: -kv[1])[:top]:
            print(f"  {ps/1e12*1e3:9.3f} ms  x{counts[nm]:<4d} {nm[:110]}")


def main():
    from dissc_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from dissc_tpu.core.config import VocoderConfig
    from dissc_tpu.train.vocoder_trainer import init_gan_state, make_gan_train_step

    pos = [a for a in sys.argv[1:] if not a.startswith("--")]
    B = int(pos[0]) if pos else 64
    top = 40
    if "--top" in sys.argv:
        top = int(sys.argv[sys.argv.index("--top") + 1])
    h = VocoderConfig(
        batch_size=B,
        disc_s2d="--s2d" in sys.argv,
        disc_compute_dtype="bfloat16" if "--disc_bf16" in sys.argv else "float32",
        compute_dtype="bfloat16" if "--trunk_bf16" in sys.argv else "float32",
    )
    seg_frames = h.segment_size // h.code_hop_size
    state, gen_tx, disc_tx = init_gan_state(h, jax.random.key(0), seg_frames)
    train_step, _ = make_gan_train_step(h, gen_tx, disc_tx)

    rng = np.random.default_rng(0)

    def make_batch():
        return {
            "code": jnp.asarray(rng.integers(0, 100, (B, seg_frames)).astype(np.int32)),
            "f0": jnp.asarray(rng.normal(0, 1, (B, seg_frames, 1)).astype(np.float32)),
            "spkr": jnp.asarray(rng.integers(0, 100, (B, 1)).astype(np.int32)),
            "audio": jnp.asarray((rng.standard_normal((B, h.segment_size)) * 0.3)
                                 .astype(np.float32)),
        }

    batches = [make_batch() for _ in range(6)]
    t0 = time.time()
    state, _ = train_step(state, batches[0])
    state, _ = train_step(state, batches[1])
    _ = float(jnp.sum(jax.tree_util.tree_leaves(state.gen_params)[0]))
    print(f"compile+warmup: {time.time()-t0:.1f}s", flush=True)

    trace_dir = "/tmp/jaxtrace"
    jax.profiler.start_trace(trace_dir)
    for i in range(2, 5):
        state, _ = train_step(state, batches[i])
    _ = float(jnp.sum(jax.tree_util.tree_leaves(state.gen_params)[0]))
    jax.profiler.stop_trace()
    print("traced 3 steps", flush=True)
    parse_xplanes(trace_dir, top)


if __name__ == "__main__":
    main()
