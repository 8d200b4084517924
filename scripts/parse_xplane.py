"""Summarize a jax.profiler xplane trace: per-op device time, top-k.

Usage: python scripts/parse_xplane.py /tmp/zs_trace
Finds the newest *.xplane.pb under the dir and prints per-HLO aggregate
device time using tensorboard_plugin_profile's raw-to-tool converter.
"""

import glob
import json
import os
import sys


def main():
    root = sys.argv[1]
    paths = sorted(glob.glob(os.path.join(root, "**", "*.xplane.pb"),
                             recursive=True), key=os.path.getmtime)
    if not paths:
        print("no xplane.pb found under", root)
        return 1
    path = paths[-1]
    print("parsing", path)
    from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

    params = {"graph_viewer_options": {}}
    for tool in ("framework_op_stats", "hlo_stats"):
        try:
            data, _ = rtd.xspace_to_tool_data([path], tool, params)
        except Exception as e:  # tool coverage varies by version
            print(f"[{tool}] failed: {e}")
            continue
        out = os.path.join(root, tool + ".json")
        if isinstance(data, bytes):
            data = data.decode("utf-8", "replace")
        with open(out, "w") as f:
            f.write(data if isinstance(data, str) else json.dumps(data))
        print(f"[{tool}] wrote {out} ({len(data)} bytes)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
