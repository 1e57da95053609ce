"""xplane trace → per-op time breakdown (host-side xprof parsing).

``utils.profiling.trace`` collects a ``jax.profiler`` trace; this module
turns the resulting ``*.xplane.pb`` into the per-kernel table DESIGN.md §6's
perf journal is built from, without opening TensorBoard:

    with profiling.trace("/tmp/t"):
        ... run the jitted loop ...
    print(trace_summary.summarize("/tmp/t"))

or::

    python -m ternary_vllm_tpu.utils.trace_summary /tmp/t [top_n]

The reference has no profiling at all (wall-clock prints only,
``test_tflite.py:177-219``); this is the TPU-native tracing subsystem's
reporting half.
"""

from __future__ import annotations

import glob
import json
import os
import sys
from typing import List, Optional


def _find_xplanes(logdir: str) -> List[str]:
    paths = sorted(glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True))
    if not paths:
        raise FileNotFoundError(f"no *.xplane.pb under {logdir}")
    return paths


def hlo_op_table(logdir: str) -> List[dict]:
    """Rows of {op, category, occurrences, total_us, avg_us} for every HLO op
    on the device, sorted by total time descending."""
    from xprof.convert import raw_to_tool_data

    data, _ = raw_to_tool_data.xspace_to_tool_data(
        _find_xplanes(logdir), "hlo_stats", {}
    )
    if isinstance(data, bytes):
        data = data.decode("utf-8", errors="replace")
    if data is None:
        # xprof returns None when the xplane has no device plane — on this
        # environment that means the TPU profiler service wasn't reachable
        # during capture (transient "No worker service stub available")
        raise RuntimeError(
            f"trace under {logdir} contains no device stats — the TPU "
            "profiler service was unavailable during capture; re-run the "
            "traced section (transient on the remote transport)"
        )
    rec = json.loads(data)
    # gviz DataTable: {cols: [{label,...}], rows: [{c: [{v: ...}, ...]}]}
    labels = [c.get("label") or c.get("id") for c in rec["cols"]]

    def col(name_frags):
        for i, lab in enumerate(labels):
            low = (lab or "").lower()
            if all(f in low for f in name_frags):
                return i
        return None

    i_name = col(["hlo op name"]) or col(["op name"]) or col(["name"])
    i_cat = col(["category"])
    i_occ = col(["occurrences"])
    i_time = col(["total time"]) or col(["time (us)"]) or col(["self time"])
    rows = []
    for r in rec["rows"]:
        cells = [c.get("v") if isinstance(c, dict) else c for c in r["c"]]
        name = cells[i_name] if i_name is not None else "?"
        total = float(cells[i_time] or 0) if i_time is not None else 0.0
        occ = int(cells[i_occ] or 0) if i_occ is not None else 0
        rows.append({
            "op": name,
            "category": cells[i_cat] if i_cat is not None else "",
            "occurrences": occ,
            "total_us": total,
            "avg_us": total / occ if occ else total,
        })
    rows.sort(key=lambda r: -r["total_us"])
    return rows


def summarize(logdir: str, top_n: int = 25, group: bool = True) -> str:
    """Human-readable per-op table; ``group=True`` also aggregates by
    category (fusion / custom-call / convert / ...)."""
    rows = hlo_op_table(logdir)
    total = sum(r["total_us"] for r in rows)
    out = [f"device total: {total:.0f} us over {len(rows)} distinct ops"]
    out.append(f"{'op':60s} {'cat':16s} {'n':>6s} {'total_us':>10s} {'avg_us':>8s}")
    for r in rows[:top_n]:
        out.append(
            f"{r['op'][:60]:60s} {str(r['category'])[:16]:16s} "
            f"{r['occurrences']:6d} {r['total_us']:10.1f} {r['avg_us']:8.2f}"
        )
    if group:
        cats = {}
        for r in rows:
            cats[r["category"]] = cats.get(r["category"], 0.0) + r["total_us"]
        out.append("-- by category --")
        for c, t in sorted(cats.items(), key=lambda kv: -kv[1]):
            out.append(f"{str(c)[:40]:40s} {t:10.1f} us  ({100 * t / max(total, 1e-9):.1f}%)")
    return "\n".join(out)


def main(argv: Optional[List[str]] = None):
    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        raise SystemExit("usage: trace_summary LOGDIR [TOP_N]")
    top = int(argv[1]) if len(argv) > 1 else 25
    print(summarize(argv[0], top))


if __name__ == "__main__":
    main()
