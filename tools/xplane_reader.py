"""Minimal XSpace/.xplane.pb reader — aggregate device op times.

The container's tensorboard profiler plugin has a protobuf version mismatch,
so this decodes the XSpace wire format directly (schema from
tsl/profiler/protobuf/xplane.proto) and prints per-op total self times for the
device plane. Used to profile gn_iteration and the fusion kernels on the TPU.
"""

from __future__ import annotations

import collections
import glob
import sys
from typing import Iterator, Tuple


def _varint(buf: bytes, i: int) -> Tuple[int, int]:
    out = 0
    shift = 0
    while True:
        b = buf[i]
        i += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, i
        shift += 7


def fields(buf: bytes) -> Iterator[Tuple[int, int, object]]:
    """Yield (field_number, wire_type, value) over a protobuf message."""
    i = 0
    n = len(buf)
    while i < n:
        tag, i = _varint(buf, i)
        fnum, wt = tag >> 3, tag & 7
        if wt == 0:
            v, i = _varint(buf, i)
        elif wt == 1:
            v = buf[i : i + 8]
            i += 8
        elif wt == 2:
            ln, i = _varint(buf, i)
            v = buf[i : i + ln]
            i += ln
        elif wt == 5:
            v = buf[i : i + 4]
            i += 4
        else:
            raise ValueError(f"wire type {wt}")
        yield fnum, wt, v


def parse_planes(path: str):
    data = open(path, "rb").read()
    planes = []
    for fnum, wt, v in fields(data):
        if fnum == 1 and wt == 2:  # XPlane
            planes.append(v)
    return planes


def plane_summary(plane: bytes):
    name = ""
    lines = []
    meta = {}
    for fnum, wt, v in fields(plane):
        if fnum == 2 and wt == 2:
            name = v.decode("utf-8", "replace")
        elif fnum == 3 and wt == 2:
            lines.append(v)
        elif fnum == 4 and wt == 2:  # map entry: key=1, value=2 (XEventMetadata)
            key = None
            mname = ""
            for f2, w2, v2 in fields(v):
                if f2 == 1 and w2 == 0:
                    key = v2
                elif f2 == 2 and w2 == 2:
                    for f3, w3, v3 in fields(v2):
                        if f3 == 2 and w3 == 2:
                            mname = v3.decode("utf-8", "replace")
            if key is not None:
                meta[key] = mname
    agg = collections.Counter()
    cnt = collections.Counter()
    for line in lines:
        for fnum, wt, v in fields(line):
            if fnum == 4 and wt == 2:  # XEvent
                mid = dur = 0
                for f2, w2, v2 in fields(v):
                    if f2 == 1 and w2 == 0:
                        mid = v2
                    elif f2 == 3 and w2 == 0:
                        dur = v2
                nm = meta.get(mid, f"meta{mid}")
                agg[nm] += dur / 1e9  # ps → ms
                cnt[nm] += 1
    return name, agg, cnt


def main(pattern: str, top: int = 30):
    for path in glob.glob(pattern):
        for plane in parse_planes(path):
            name, agg, cnt = plane_summary(plane)
            if not agg:
                continue
            total = sum(agg.values())
            print(f"\n== plane: {name}  (total {total:.1f} ms over events)")
            for op, ms in agg.most_common(top):
                print(f"  {ms:9.2f} ms  x{cnt[op]:<6d} {op[:110]}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/jaxtrace/plugins/profile/*/*.xplane.pb",
         int(sys.argv[2]) if len(sys.argv) > 2 else 30)
