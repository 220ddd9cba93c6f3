#!/usr/bin/env python3
"""Summarize a jax.profiler trace: top device ops by self time.

Usage: python tools/parse_xplane.py /tmp/xtrace [top_n] [name_filter]

Reads the newest .xplane.pb under the logdir with a minimal, dependency-free
protobuf wire parser (the installed tensorboard-plugin-profile build ships no
xplane_pb2) and prints per-op duration aggregates from the device planes —
the visibility needed to attack the conv/transformer utilization gaps
(PERFORMANCE.md).
"""

import glob
import os
import sys
from collections import defaultdict


# --- minimal protobuf wire-format reader -----------------------------------

def _read_varint(buf, i):
    out = 0
    shift = 0
    while True:
        b = buf[i]
        i += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, i
        shift += 7


def fields(buf):
    """Yields (field_number, wire_type, value) over a message buffer."""
    i = 0
    n = len(buf)
    while i < n:
        key, i = _read_varint(buf, i)
        field, wt = key >> 3, key & 7
        if wt == 0:  # varint
            v, i = _read_varint(buf, i)
        elif wt == 1:  # 64-bit
            v = buf[i : i + 8]
            i += 8
        elif wt == 2:  # length-delimited
            ln, i = _read_varint(buf, i)
            v = buf[i : i + ln]
            i += ln
        elif wt == 5:  # 32-bit
            v = buf[i : i + 4]
            i += 4
        else:
            raise ValueError(f"unsupported wire type {wt}")
        yield field, wt, v


# --- xplane schema (tsl/profiler/protobuf/xplane.proto) --------------------

def parse_space(buf):
    planes = []
    for f, _wt, v in fields(buf):
        if f == 1:
            planes.append(parse_plane(v))
    return planes


def parse_plane(buf):
    plane = {"name": "", "lines": [], "event_meta": {}}
    for f, _wt, v in fields(buf):
        if f == 2:
            plane["name"] = v.decode("utf-8", "replace")
        elif f == 3:
            plane["lines"].append(parse_line(v))
        elif f == 11:  # map<int64, XEventMetadata>
            key, meta = None, None
            for mf, _mw, mv in fields(v):
                if mf == 1:
                    key = mv
                elif mf == 2:
                    meta = parse_event_metadata(mv)
            if key is not None and meta is not None:
                plane["event_meta"][key] = meta
    return plane


def parse_event_metadata(buf):
    out = {"name": ""}
    for f, _wt, v in fields(buf):
        if f == 2:
            out["name"] = v.decode("utf-8", "replace")
    return out


def parse_line(buf):
    line = {"name": "", "events": []}
    for f, _wt, v in fields(buf):
        if f == 2:
            line["name"] = v.decode("utf-8", "replace")
        elif f == 6:
            line["events"].append(parse_event(v))
    return line


def parse_event(buf):
    ev = {"metadata_id": 0, "duration_ps": 0}
    for f, _wt, v in fields(buf):
        if f == 1:
            ev["metadata_id"] = v
        elif f == 3:
            ev["duration_ps"] = v
    return ev


# ---------------------------------------------------------------------------

def find_xplane(logdir: str):
    files = sorted(
        glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime,
    )
    return files[-1] if files else None


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    logdir = argv[0] if argv else "/tmp/xtrace"
    top_n = int(argv[1]) if len(argv) > 1 else 25
    name_filter = argv[2] if len(argv) > 2 else None

    path = logdir if logdir.endswith(".pb") else find_xplane(logdir)
    if not path or not os.path.exists(path):
        print(f"no .xplane.pb under {logdir}", file=sys.stderr)
        return 1

    with open(path, "rb") as f:
        planes = parse_space(f.read())

    print(f"planes in {os.path.basename(path)}:")
    for p in planes:
        n_ev = sum(len(ln["events"]) for ln in p["lines"])
        print(f"  {p['name']}: {len(p['lines'])} lines, {n_ev} events")

    for p in planes:
        name = p["name"]
        if name_filter and name_filter not in name:
            continue
        if not name_filter and not ("TPU" in name or "/device" in name):
            continue
        metas = {k: m["name"] for k, m in p["event_meta"].items()}
        agg = defaultdict(float)
        cnt = defaultdict(int)
        for ln in p["lines"]:
            for ev in ln["events"]:
                op = metas.get(ev["metadata_id"], str(ev["metadata_id"]))
                agg[op] += ev["duration_ps"] / 1e9  # ms
                cnt[op] += 1
        total = sum(agg.values())
        print(f"\n== {name} (sum of event durations {total:.2f} ms) ==")
        for op, ms in sorted(agg.items(), key=lambda kv: -kv[1])[:top_n]:
            print(f"  {ms:9.3f} ms  x{cnt[op]:<5d} {op[:110]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
