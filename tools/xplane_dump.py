"""Minimal schemaless xplane.pb reader: aggregate device-op durations.

Schema (tensorflow/core/profiler/protobuf/xplane.proto):
  XSpace.planes=1 ; XPlane{id=1,name=2,lines=3,event_metadata=4(map)}
  XLine{id=1,display_id=2,name=3,display_name=4,timestamp_ns=5,
        duration_ps=6? (actually 9), events=7? ...}
  We parse generically and use known field numbers:
  XLine.events = 7, XEvent{metadata_id=1, offset_ps=2, duration_ps=3}
  XPlane.event_metadata value: XEventMetadata{id=1,name=2}
"""

import sys
from collections import defaultdict


def varint(buf, i):
    x = 0
    s = 0
    while True:
        b = buf[i]
        i += 1
        x |= (b & 0x7F) << s
        if not b & 0x80:
            return x, i
        s += 7


def fields(buf):
    """Yield (field_no, wire_type, value) over a message buffer."""
    i = 0
    n = len(buf)
    while i < n:
        tag, i = varint(buf, i)
        f, wt = tag >> 3, tag & 7
        if wt == 0:
            v, i = varint(buf, i)
        elif wt == 2:
            ln, i = varint(buf, i)
            v = buf[i : i + ln]
            i += ln
        elif wt == 5:
            v = buf[i : i + 4]
            i += 4
        elif wt == 1:
            v = buf[i : i + 8]
            i += 8
        else:
            raise ValueError(f"wire type {wt}")
        yield f, wt, v


def parse(path):
    buf = open(path, "rb").read()
    for f, wt, v in fields(buf):
        if f == 1 and wt == 2:  # XPlane
            plane_name = ""
            meta = {}
            lines = []
            for pf, pwt, pv in fields(v):
                if pf == 2 and pwt == 2:
                    plane_name = pv.decode(errors="replace")
                elif pf == 4 and pwt == 2:  # map entry
                    key, val = None, None
                    for mf, mwt, mv in fields(pv):
                        if mf == 1:
                            key = mv
                        elif mf == 2:
                            val = mv
                    if val is not None:
                        name = ""
                        mid = key
                        for ef, ewt, ev in fields(val):
                            if ef == 1 and ewt == 0:
                                mid = ev
                            elif ef == 2 and ewt == 2:
                                name = ev.decode(errors="replace")
                        meta[mid] = name
                elif pf == 3 and pwt == 2:
                    lines.append(pv)
            agg = defaultdict(float)
            cnt = defaultdict(int)
            for lv in lines:
                for lf, lwt, lvv in fields(lv):
                    if lf == 7 and lwt == 2:  # XEvent
                        mid, dur = None, 0
                        for ef, ewt, ev in fields(lvv):
                            if ef == 1 and ewt == 0:
                                mid = ev
                            elif ef == 3 and ewt == 0:
                                dur = ev
                        name = meta.get(mid, f"#{mid}")
                        agg[name] += dur / 1e9  # ps -> ms
                        cnt[name] += 1
            if agg:
                total = sum(agg.values())
                print(f"== plane: {plane_name}  (total {total:.1f} ms)")
                for name, ms in sorted(agg.items(), key=lambda kv: -kv[1])[:30]:
                    print(f"  {ms:10.2f} ms x{cnt[name]:<6d} {name[:110]}")


if __name__ == "__main__":
    parse(sys.argv[1])
