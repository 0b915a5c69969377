#!/usr/bin/env python
"""Per-op roofline audit: which XLA ops dominate, and is each at its own
ceiling?

Captures a ``jax.profiler`` trace of the fused GAN train step (or the
serving decode stage with ``--stage decode``), then runs xprof's
``roofline_model`` analysis over the ``.xplane.pb``: every HLO op gets its
measured time, its limiter (Compute / HBM / CMEM / VMEM), and its
``roofline_efficiency`` — achieved rate as a fraction of the bound its own
operational intensity allows.  The summary aggregates time by limiter and
lists the dominant ops furthest below their bound; that answers the
"is 35 % MFU the ceiling?" question quantitatively (VERDICT round-2 item:
per-op table vs own roofline).  Aggregate MFU tables live in
``tools/bench_train.py`` / ``tools/bench_cost.py``; this is the per-op
breakdown behind them.

Usage:
    python tools/profile_ops.py                  # train step, batch 64
    python tools/profile_ops.py --stage decode   # serving decode stage
    python tools/profile_ops.py --stage encode   # serving encode stage
    python tools/profile_ops.py --top 20 --json /tmp/ops.json
    python tools/profile_ops.py --logdir <dir>   # re-analyze existing trace
"""

import argparse
import collections
import glob
import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _find_xplane(logdir):
    paths = glob.glob(
        os.path.join(logdir, "**", "*.xplane.pb"), recursive=True
    )
    if not paths:
        raise FileNotFoundError(f"no .xplane.pb under {logdir}")
    return max(paths, key=os.path.getmtime)


def roofline_rows(xplane_path):
    """Flat per-op roofline rows from xprof's roofline_model tool.

    Returns a list of dicts (operation, category, self_time_us, bound_by,
    roofline_efficiency, compute_efficiency, occurrences, ...), deduplicated
    (the tool emits one row per (step, module) view; we keep step=='Total'
    and collapse duplicate operation rows).
    """
    from xprof.convert import raw_to_tool_data as r

    out, _ = r.xspace_to_tool_data([xplane_path], "roofline_model", {})
    table = json.loads(out if isinstance(out, str) else out.decode())[0]
    cols = [c["id"] for c in table["cols"]]
    ix = {k: i for i, k in enumerate(cols)}

    def v(row, key):
        cell = row["c"][ix[key]]
        return cell["v"] if cell else None

    seen = {}
    for row in table["rows"]:
        if v(row, "step") != "Total":
            continue
        cat = v(row, "category")
        op = v(row, "operation")
        if cat == "Program" or op == "IDLE":
            continue
        key = (op, cat, v(row, "hlo_module_id"))
        if key in seen:   # duplicate view of the same op
            continue
        seen[key] = {
            "operation": op,
            "category": cat,
            "self_time_us": v(row, "total_self_time") or 0.0,
            "occurrences": int(v(row, "occurrences") or 0),
            "bound_by": v(row, "bound_by"),
            "roofline_efficiency": v(row, "roofline_efficiency") or 0.0,
            "compute_efficiency": v(row, "compute_efficiency") or 0.0,
            "measured_flop_rate": v(row, "measured_flop_rate"),
            "measured_memory_bw": v(row, "measured_memory_bw"),
            "operational_intensity": v(row, "operational_intensity"),
            "dma_stall_percent": v(row, "dma_stall_percent"),
        }
    return list(seen.values())


def op_profile_summary(xplane_path):
    """Whole-program MFU / HBM utilization from xprof's op_profile tool."""
    from xprof.convert import raw_to_tool_data as r

    out, _ = r.xspace_to_tool_data([xplane_path], "op_profile", {})
    d = json.loads(out if isinstance(out, str) else out.decode())
    m = d["byProgramExcludeIdle"]["metrics"]
    return {
        "mfu": m.get("flops"),
        "hbm_util": (m.get("bandwidthUtils") or [None])[0],
        "raw_time_ps": m.get("rawTime"),
        "raw_flops": m.get("rawFlops"),
    }


def summarize(rows, reps, top):
    total = sum(r["self_time_us"] for r in rows)
    by_bound = collections.defaultdict(lambda: [0.0, 0.0])
    for r in rows:
        b = by_bound[r["bound_by"]]
        b[0] += r["self_time_us"]
        b[1] += r["self_time_us"] * r["roofline_efficiency"]

    print(f"device self-time {total / reps / 1e3:.1f} ms/step across "
          f"{len(rows)} ops ({reps} steps traced)")
    print("\ntime by limiter (roofline eff = achieved/bound, time-weighted):")
    for bound, (t, te) in sorted(by_bound.items(), key=lambda kv: -kv[1][0]):
        print(f"  {str(bound):12s} {t / reps / 1e3:7.1f} ms/step "
              f"({100 * t / total:4.1f}%)  roofline eff "
              f"{100 * te / t if t else 0:5.1f}%")

    rows = sorted(rows, key=lambda r: -r["self_time_us"])
    hdr = (f"\n{'operation':40s} {'category':22s} {'ms/st':>6s} {'%':>5s} "
           f"{'bound':>10s} {'roof%':>6s} {'comp%':>6s} {'n':>5s}")
    print(hdr)
    print("-" * len(hdr))
    for r in rows[:top]:
        print(f"{r['operation'][:40]:40s} {r['category'][:22]:22s} "
              f"{r['self_time_us'] / reps / 1e3:6.2f} "
              f"{100 * r['self_time_us'] / total:5.1f} "
              f"{str(r['bound_by']):>10s} "
              f"{100 * r['roofline_efficiency']:6.1f} "
              f"{100 * r['compute_efficiency']:6.1f} "
              f"{r['occurrences'] // reps:5d}")


def _trace_train_step(batch, frames, logdir):
    import jax

    from personalized_text_to_speech_tpu.utils import runtime
    from tools.bench_train import build_step  # reuse the bench's fused step

    runtime.enable_compilation_cache()
    runtime.warmup_transfers()
    step_once, state = build_step(batch, frames)
    # warm up / compile outside the trace so only execution is captured
    for _ in range(2):
        state, metrics = step_once(state)
    jax.block_until_ready(metrics)
    with jax.profiler.trace(logdir):
        for _ in range(3):
            state, metrics = step_once(state)
        jax.block_until_ready(metrics)
    return 3


def _trace_serving(batch, logdir, stage):
    """Trace the serving encode or decode stage (``stage`` ∈ encode|decode).

    The encode stage (text→durations/prior: rel-pos attention + SDP reverse
    flow) runs at 4.6% MFU / 56% HBM in the aggregate roofline
    (tools/bench_cost.py); ``--stage encode`` gives it the same per-op
    audit the decode stage got in round 3, so "HBM-bound, nothing
    recoverable" is shown rather than asserted."""
    import jax

    from personalized_text_to_speech_tpu.config import default_model_config
    from personalized_text_to_speech_tpu.infer import TTSEngine
    from personalized_text_to_speech_tpu.utils import runtime

    runtime.enable_compilation_cache()
    runtime.warmup_transfers()
    hps = default_model_config(n_speakers=999)
    eng = TTSEngine(hps, dtype="bfloat16")
    t_bucket = eng.text_buckets[-2]
    cost = eng.cost_analysis(batch, t_bucket=t_bucket)
    f_bucket = int(cost["buckets"]["frames"])
    x = np.zeros((batch, t_bucket), np.int32)
    x[:, :8] = 1
    x_lengths = np.full((batch,), t_bucket, np.int32)
    sid = np.zeros((batch,), np.int32)
    rng = np.uint32(0)
    enc = eng._encode_fn(t_bucket)
    enc_out = enc(eng.params, x, x_lengths, sid,
                  np.float32(1.0), np.float32(0.8), rng)
    if stage == "encode":
        jax.block_until_ready(enc_out)
        with jax.profiler.trace(logdir):
            for _ in range(3):
                enc_out = enc(eng.params, x, x_lengths, sid,
                              np.float32(1.0), np.float32(0.8), rng)
            jax.block_until_ready(enc_out)
        return 3
    w_ceil, m_p, logs_p, x_mask, _ = enc_out
    dec = eng._decode_fn(t_bucket, f_bucket)
    out = dec(eng.params, w_ceil, m_p, logs_p, x_mask, sid,
              np.float32(0.667), rng, pcm16=True)
    jax.block_until_ready(out)
    with jax.profiler.trace(logdir):
        for _ in range(3):
            out = dec(eng.params, w_ceil, m_p, logs_p, x_mask, sid,
                      np.float32(0.667), rng, pcm16=True)
        jax.block_until_ready(out)
    return 3


def main():
    # fail fast instead of futex-hanging when the TPU tunnel relay is
    # dead (utils/runtime.require_tpu_reachable; CLAUDE.md ops notes)
    from personalized_text_to_speech_tpu.utils.runtime import (
        require_tpu_reachable,
    )

    require_tpu_reachable()
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", choices=["train", "decode", "encode"],
                    default="train")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--frames", type=int, default=400,
                    help="train-step segment frames")
    ap.add_argument("--top", type=int, default=15)
    ap.add_argument("--json", default=None, help="write full rows here")
    ap.add_argument("--logdir", default=None,
                    help="parse an existing trace instead of capturing one")
    ap.add_argument("--reps", type=int, default=None,
                    help="steps in the existing trace (with --logdir)")
    args = ap.parse_args()

    logdir = args.logdir
    if logdir is None:
        logdir = tempfile.mkdtemp(prefix="ptts_prof_")
        if args.stage == "train":
            reps = _trace_train_step(args.batch, args.frames, logdir)
        else:
            reps = _trace_serving(args.batch, logdir, args.stage)
        print(f"trace captured → {logdir}")
    else:
        reps = args.reps or 1

    xplane = _find_xplane(logdir)
    prog = op_profile_summary(xplane)
    if prog["mfu"] is not None:
        print(f"program: MFU {100 * prog['mfu']:.1f}%  "
              f"HBM {100 * (prog['hbm_util'] or 0):.1f}%  "
              f"device {prog['raw_time_ps'] * 1e-9 / reps:.1f} ms/step")
    rows = roofline_rows(xplane)
    if not rows:
        print("no per-op rows found in trace", file=sys.stderr)
        sys.exit(1)
    summarize(rows, reps, args.top)

    if args.json:
        with open(args.json, "w") as f:
            json.dump({"program": prog, "reps": reps, "ops": rows}, f,
                      indent=1)
        print(f"\nfull rows → {args.json}")


if __name__ == "__main__":
    main()
