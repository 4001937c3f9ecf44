"""Parse an xplane.pb into top-op / category hlo_stats tables.

Usage: python tools/parse_hlo_stats.py <xplane.pb> [top_n]
"""

import json
import re
import sys


def load_table(xplane_path):
    from xprof.convert import raw_to_tool_data as conv
    data, _ = conv.xspace_to_tool_data([xplane_path], "hlo_stats", {})
    if isinstance(data, bytes):
        data = data.decode("utf-8", "replace")
    # gviz json-ish: single quotes on datetime etc; parse leniently
    m = re.search(r'"rows":', data)
    cols = json.loads(
        re.sub(r'([,{])\s*([a-zA-Z_]+):', r'\1"\2":',
               data[data.index('"cols"') - 1:m.start() - 1].rstrip(",")
               + "}"))["cols"]
    # rows: parse with json after normalizing
    rows_text = data[m.end():].rstrip()
    if rows_text.endswith("}"):
        rows_text = rows_text[:-1]
    rows = json.loads(re.sub(r'([,{])\s*v:', r'\1"v":', rows_text))
    labels = [c["label"] for c in cols]
    table = [[cell.get("v") if isinstance(cell, dict) else cell
              for cell in row["c"]] for row in rows]
    return labels, table


def main():
    path = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    labels, table = load_table(path)
    i_cat = labels.index("HLO op category")
    i_name = labels.index("HLO op name")
    i_self = labels.index("Total self time (us)")
    i_occ = labels.index("#Occurrences")
    i_bound = (labels.index("Bound by")
               if "Bound by" in labels else None)

    table.sort(key=lambda r: -(r[i_self] or 0))
    total = sum(r[i_self] or 0 for r in table)
    print(f"total self time: {total:.0f} us")
    print(f"{'us':>10} {'%':>5} {'occ':>5} {'bound':<8} {'cat':<26} name")
    for r in table[:top_n]:
        t = r[i_self] or 0
        bound = (r[i_bound] or "")[:8] if i_bound is not None else ""
        print(f"{t:10.0f} {100 * t / total:5.1f} {r[i_occ] or 0:5.0f} "
              f"{bound:<8} {str(r[i_cat])[:26]:<26} {str(r[i_name])[:100]}")

    agg = {}
    for r in table:
        agg[r[i_cat]] = agg.get(r[i_cat], 0.0) + (r[i_self] or 0)
    print("\nby category:")
    for k, v in sorted(agg.items(), key=lambda kv: -kv[1]):
        print(f"{v:10.0f} {100 * v / total:5.1f}  {k}")


if __name__ == "__main__":
    main()
