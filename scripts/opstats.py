"""Parse an xplane trace dir into a per-op time table (framework_op_stats).

Usage: python scripts/opstats.py /tmp/jaxtrace_<name>_<mode> [top_n]

Prints ops sorted by total self-time with occurrences, avg time, FLOP rate
and memory bandwidth — the raw material for the README roofline tables.
Pure host-side parsing: safe to run while nothing else needs the CPU.
"""
import glob
import json
import sys


def main():
    trace_dir = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    paths = sorted(glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True))
    if not paths:
        sys.exit(f"no xplane.pb under {trace_dir}")
    from xprof.convert import raw_to_tool_data as rtd

    data, _ = rtd.xspace_to_tool_data([paths[-1]], "framework_op_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    rows = json.loads(data)
    if isinstance(rows, list) and rows and isinstance(rows[0], dict) \
            and "rows" in rows[0]:
        # [device_table, host_table] — device ops are table 0
        rows = rows[0]
    # gviz DataTable: {'cols': [...], 'rows': [{'c': [{'v': ...}, ...]}]}
    if isinstance(rows, dict) and "rows" in rows:
        cols = [c.get("label") or c.get("id") for c in rows["cols"]]
        recs = [dict(zip(cols, [c.get("v") if c else None
                                for c in r["c"]])) for r in rows["rows"]]
    else:
        recs = rows
    if not recs:
        sys.exit("no rows")
    keys = list(recs[0].keys())
    print("columns:", keys)

    def pick(rec, *names, default=0.0):
        for n in names:
            for k in keys:
                if n == k.lower().replace(" ", "_").replace("-", "_"):
                    v = rec.get(k)
                    try:
                        return float(v)
                    except (TypeError, ValueError):
                        return v
        return default

    total = sum(pick(r, "total_self_time_(us)", "total_self_time",
                     "self_time_(us)") or 0.0 for r in recs)
    print(f"total self time: {total / 1e3:.1f} ms (across traced steps)")
    recs.sort(key=lambda r: -(pick(r, "total_self_time_(us)",
                                   "total_self_time", "self_time_(us)")
                              or 0.0))
    hdr = f"{'self ms':>9} {'%':>5} {'#':>4} {'GFLOP/s':>9} {'GB/s':>7}  op"
    print(hdr)
    for r in recs[:top_n]:
        st = (pick(r, "total_self_time_(us)", "total_self_time",
                   "self_time_(us)") or 0.0) / 1e3
        occ = pick(r, "#occurrences", "occurrences", default=0)
        gfs = pick(r, "gflop/s", "gflops/s", "flop_rate_(gflop/s)",
                   "model_flop_rate_(gflop/s)", "measured_flop_rate",
                   default=0)
        bw = pick(r, "gb/s", "bandwidth_(gb/s)", "measured_memory_bw",
                  "measured_memory_bw_(gbytes/sec)", default=0)
        name = (pick(r, "operation", "operation_name", "op_name", "name",
                     default="?") or "?")
        typ = pick(r, "type", "operation_type", "category", default="")
        print(f"{st:9.2f} {st / total * 1e5:5.1f} {occ:4.0f} {gfs:9.0f} "
              f"{bw:7.0f}  {typ} {str(name)[:90]}")


if __name__ == "__main__":
    main()
