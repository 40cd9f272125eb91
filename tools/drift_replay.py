#!/usr/bin/env python3
"""Replay the bench drift rule over two BENCH_DETAIL-format artifacts.

The round-over-round drift self-report (graft.Bench) flags per-query wall
regressions. Raw-wall comparison produced a false flag cluster whenever the
GRADING window itself was slow (r12 q_quality_gate, r13's five-query
cluster — both adjudicated ambient): walls wandered with the box while
task_sec stayed flat. The r14 rule (judge r13 #4) normalizes and
corroborates:

  floor_ratio = max(1.0, cur_sentinel_floor / prior_sentinel_floor)
  wall_flag   = now.wall > prev.wall * floor_ratio * 1.4
                and now.wall - prev.wall * floor_ratio > 0.25
  work_flag   = (now.task_sec > prev.task_sec * 1.25 and delta > 0.1 s)
                or (now.proc_cpu > prev.proc_cpu * 1.25 and delta > 0.25 s)
  DRIFT       = wall_flag and work_flag        (wall-only when the prior
                artifact lacks work fields — pre-r13 format)

The sentinel floor is the fixed scan+agg probe both artifacts already
record (__sentinel.floor): it moves with the box, not the code, so its
ratio is the ambient scale factor. task_sec/proc_cpu measure WORK and are
ambience-insensitive on an idle-enough box — a real regression moves them
with the wall; a slow grading window moves the wall alone.

Usage:
  tools/drift_replay.py PRIOR.json CURRENT.json
  tools/drift_replay.py PRIOR.json CURRENT.json --synth q_dbscan 1.5

--synth multiplies one query's wall AND task_sec/proc_cpu by the factor
before replay — the "a genuinely regressed query still fires" leg.

Exit code: number of flags (0 = clean).
"""
import json
import sys


WALL_FACTOR, WALL_ABS = 1.4, 0.25
WORK_FACTOR, TASK_ABS, CPU_ABS = 1.25, 0.1, 0.25


def queries(detail):
    return {k: v for k, v in detail.items()
            if not k.startswith("__") and not k.startswith("serving_")
            and isinstance(v, dict) and "wall" in v}


def drift_flags(prior, cur):
    """Min-statistic rule (matches graft.Bench r15): compare wall_min /
    task_min / cpu_min when recorded — the min across quiet-box attempts is
    stable where selected-median per-query values redistribute even on a
    clean box (a validation run measured total task_sec FLAT at 732→725 s
    while six medians moved past 1.25x). A pre-min artifact falls back to
    its selected wall/task/cpu, which is >= its min — conservative for
    flagging. Work corroboration is task OR proc_cpu (advisor r14): a real
    wall regression with flat TASK time — driver-side work, e.g. per-search
    collects — still moves the driver process's cpu-seconds."""
    pf = (prior.get("__sentinel") or {}).get("floor") or 0.0
    cf = (cur.get("__sentinel") or {}).get("floor") or 0.0
    ratio = max(1.0, cf / pf) if pf > 0 and cf > 0 else 1.0
    flags = []
    pq, cq = queries(prior), queries(cur)
    for name, now in cq.items():
        prev = pq.get(name)
        if prev is None:
            continue
        pw = prev.get("wall_min", prev["wall"])
        nw = now.get("wall_min", now["wall"])
        norm = pw * ratio
        wall_flag = nw > norm * WALL_FACTOR and nw - norm > WALL_ABS
        if not wall_flag:
            continue
        pt = prev.get("task_min", prev.get("task_sec"))
        ct = now.get("task_min", now.get("task_sec"))
        pc = prev.get("cpu_min", prev.get("proc_cpu"))
        cc = now.get("cpu_min", now.get("proc_cpu"))
        task_leg = (pt is not None and ct is not None
                    and ct > pt * WORK_FACTOR and ct - pt > TASK_ABS)
        cpu_leg = (pc is not None and cc is not None
                   and cc > pc * WORK_FACTOR and cc - pc > CPU_ABS)
        # wall-only fallback when the prior has NO work fields at all
        if (pt is None and pc is None) or task_leg or cpu_leg:
            flags.append((name, pw, nw, ratio, pt, ct, pc, cc))
    return ratio, flags


def main():
    args = sys.argv[1:]
    if len(args) not in (2, 5) or (len(args) == 5 and args[2] != "--synth"):
        print(__doc__)
        return 2
    with open(args[0]) as f:
        prior = json.load(f)
    with open(args[1]) as f:
        cur = json.load(f)
    if len(args) == 5:
        name, factor = args[3], float(args[4])
        q = dict(cur[name])
        for field in ("wall", "task_sec", "proc_cpu",
                      "wall_min", "task_min", "cpu_min"):
            if field in q:
                q[field] = q[field] * factor
        cur = dict(cur)
        cur[name] = q
        print(f"synthesized regression: {name} x{factor} (wall+task_sec+proc_cpu)")
    ratio, flags = drift_flags(prior, cur)
    print(f"floor_ratio={ratio:.3f} "
          f"(prior={((prior.get('__sentinel') or {}).get('floor') or 0):.3f} "
          f"cur={((cur.get('__sentinel') or {}).get('floor') or 0):.3f})")
    for name, p, n, r, pt, ct, pc, cc in flags:
        print(f"DRIFT {name}: wall {p:.3f}->{n:.3f} ({n / p:.2f}x raw, "
              f"{n / (p * r):.2f}x floor-normalized) task {pt}->{ct} "
              f"cpu {pc}->{cc}")
    print(f"{len(flags)} flag(s)")
    return min(len(flags), 120)


if __name__ == "__main__":
    sys.exit(main())
