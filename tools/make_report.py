"""Build an HTML gallery over the snapshot corpus (the role of the
reference's snapshot-report tooling): one page with every golden PNG,
grouped, with names and sizes.

Usage: python tools/make_report.py [out.html]
"""

import base64
import os
import sys

sys.path.insert(0, ".")

SNAP = "tests/snapshots"


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "docs/gallery/report.html"
    groups = {"reference ports (ref_*)": [], "corpus scenes": []}
    for f in sorted(os.listdir(SNAP)):
        if not f.endswith(".png"):
            continue
        key = "reference ports (ref_*)" if f.startswith("ref_") \
            else "corpus scenes"
        groups[key].append(f)
    cells = []
    for title, files in groups.items():
        cells.append(f"<h2>{title} ({len(files)})</h2><div class='g'>")
        for f in files:
            p = os.path.join(SNAP, f)
            b64 = base64.b64encode(open(p, "rb").read()).decode()
            kb = os.path.getsize(p) // 1024
            cells.append(
                f"<figure><img src='data:image/png;base64,{b64}'>"
                f"<figcaption>{f[:-4]} · {kb} KB</figcaption></figure>")
        cells.append("</div>")
    html = ("<!doctype html><meta charset='utf-8'>"
            "<title>vello_tpu snapshot gallery</title><style>"
            "body{font:14px system-ui;background:#111;color:#ddd;"
            "margin:2em}h2{border-bottom:1px solid #333}"
            ".g{display:flex;flex-wrap:wrap;gap:12px}"
            "figure{margin:0;background:#1a1a1a;padding:8px;"
            "border-radius:6px}img{max-width:220px;max-height:220px;"
            "image-rendering:pixelated;display:block}"
            "figcaption{font-size:11px;color:#999;margin-top:4px}"
            "</style><h1>vello_tpu snapshot gallery</h1>"
            + "".join(cells))
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        f.write(html)
    n = sum(len(v) for v in groups.values())
    print(f"wrote {out_path}: {n} snapshots")


if __name__ == "__main__":
    main()
