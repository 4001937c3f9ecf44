"""Profile the fused-inference benchmark on the TPU and dump per-op stats.

Runs bench.build() under jax.profiler, then converts the xplane trace into
hlo_stats via xprof/tensorboard-plugin-profile and prints the top ops by
self time.  Usage:  python tools/profile_bench.py [out_dir]
"""

import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    out_dir = args[0] if args else "/tmp/riders_trace"
    preset = "zju" if "--zju" in sys.argv[1:] else "ntu"
    import bench

    fused, rc_vars, sml_vars, batch = bench.build(preset)

    @jax.jit
    def chain(rc_vars, sml_vars, batch, n):
        def body(i, carry):
            img = carry
            depth = fused(rc_vars, sml_vars, {**batch, "image": img})
            img = img + 1e-12 * depth[..., None]
            return img
        return jax.lax.fori_loop(0, n, body, batch["image"])

    # compile + warm up
    np.asarray(chain(rc_vars, sml_vars, batch, 2).reshape(-1)[0])

    jax.profiler.start_trace(out_dir)
    np.asarray(chain(rc_vars, sml_vars, batch, 8).reshape(-1)[0])
    jax.profiler.stop_trace()

    xplanes = glob.glob(os.path.join(out_dir, "**", "*.xplane.pb"),
                        recursive=True)
    xplanes.sort(key=os.path.getmtime)
    print("xplane:", xplanes[-1])
    data = None
    for mod in ("xprof.convert.raw_to_tool_data",
                "tensorboard_plugin_profile.convert.raw_to_tool_data"):
        try:
            import importlib
            m = importlib.import_module(mod)
            data, _ = m.xspace_to_tool_data([xplanes[-1]], "hlo_stats", {})
            break
        except Exception as e:
            print(f"{mod}: {type(e).__name__}: {e}")
    if data is None:
        print("no converter available; inspect the trace with xprof")
        return

    import csv
    import io
    import json
    if isinstance(data, bytes):
        data = data.decode("utf-8", "replace")
    try:
        # Newer xprof emits a gviz JSON DataTable instead of CSV.
        table = json.loads(data)
        header = [c.get("label") or c.get("id", "") for c in table["cols"]]
        rows = [header] + [
            [("" if cell is None or cell.get("v") is None else str(cell["v"]))
             for cell in row["c"]]
            for row in table.get("rows", [])]
    except (ValueError, KeyError, TypeError):
        rows = list(csv.reader(io.StringIO(data)))
    header = rows[0]
    print("columns:", header)
    # pick self-time column
    tcol = next(i for i, h in enumerate(header)
                if "self" in h.lower() and "time" in h.lower()
                and "%" not in h)
    ncol = next((i for i, h in enumerate(header)
                 if "hlo op name" in h.lower() or "op name" in h.lower()), 1)
    ccol = next((i for i, h in enumerate(header)
                 if "category" in h.lower()), None)
    body = rows[1:]
    body.sort(key=lambda r: -float(r[tcol] or 0))
    total = sum(float(r[tcol] or 0) for r in body)
    print(f"total self time: {total:.0f}")
    print(f"{'self':>12}  {'%':>5}  {'cat':<22} name")
    for r in body[:60]:
        t = float(r[tcol] or 0)
        cat = r[ccol] if ccol is not None else ""
        print(f"{t:12.0f}  {100 * t / total:5.1f}  {cat:<22} "
              f"{r[ncol][:110]}")

    # category rollup
    if ccol is not None:
        agg = {}
        for r in body:
            agg[r[ccol]] = agg.get(r[ccol], 0.0) + float(r[tcol] or 0)
        print("\nby category:")
        for k, v in sorted(agg.items(), key=lambda kv: -kv[1]):
            print(f"{v:12.0f}  {100 * v / total:5.1f}  {k}")


if __name__ == "__main__":
    main()
