#!/usr/bin/env python3
"""Top-ops summary of a jax.profiler xplane.pb trace (no TF/tensorboard
dependency — this image's tensorboard_plugin_profile protos are broken, so
this parses the protobuf wire format directly).

Usage: python tools/xprof_top.py <dir-or-xplane.pb> [N] [--cat] [--all]
Prints the N heaviest XLA ops on the device plane with total seconds, call
count, and share of device time. Async DMA ops (copy-start/slice-start —
overlapped MSA prefetches whose durations double-count against compute) are
excluded unless --all is given; the remaining op time sums to wall time.
--cat groups ops by category (fusion/conv/custom-call kind) instead of
listing individuals.
"""
import glob
import os
import re
import sys
from collections import defaultdict

_ASYNC = ("copy-start", "slice-start", "copy-done", "slice-done",
          "all-reduce-start", "all-gather-start", "collective-permute-start")


def _category(nm):
    base = nm.split(" = ")[0].lstrip("%")
    base = re.sub(r"\.\d+$", "", base)
    for k in ("ssm_scan", "flash_attention", "convolution", "fusion",
              "dynamic-update-slice", "dynamic-slice", "reduce", "transpose",
              "reshape", "broadcast", "copy", "add", "multiply", "select",
              "iota", "convert", "bitcast", "pad", "slice", "concatenate"):
        if base.startswith(k) or f"_{k}" in base or base.endswith(k):
            return k if base.startswith(k) else base
    return base


def _varint(buf, i):
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
    """Yield (field_number, wire_type, value) for one message."""
    i = 0
    n = len(buf)
    while i < n:
        key, i = _varint(buf, i)
        fn, wt = key >> 3, key & 7
        if wt == 0:
            v, i = _varint(buf, i)
        elif wt == 2:
            ln, i = _varint(buf, i)
            v = buf[i:i + ln]
            i += ln
        elif wt == 5:
            v = buf[i:i + 4]
            i += 4
        elif wt == 1:
            v = buf[i:i + 8]
            i += 8
        else:
            raise ValueError(f"wire type {wt}")
        yield fn, wt, v


def parse_plane(buf):
    name = ""
    lines = []
    meta = {}
    for fn, wt, v in fields(buf):
        if fn == 2 and wt == 2:
            name = v.decode("utf-8", "replace")
        elif fn == 3 and wt == 2:
            lines.append(v)
        elif fn == 4 and wt == 2:  # map entry: key=1 varint, value=2 msg
            k = None
            mname = ""
            for fn2, wt2, v2 in fields(v):
                if fn2 == 1 and wt2 == 0:
                    k = v2
                elif fn2 == 2 and wt2 == 2:
                    for fn3, wt3, v3 in fields(v2):
                        if fn3 == 2 and wt3 == 2:
                            mname = v3.decode("utf-8", "replace")
            if k is not None:
                meta[k] = mname
    return name, lines, meta


def parse_line(buf):
    name = ""
    events = []
    for fn, wt, v in fields(buf):
        if fn == 2 and wt == 2:
            name = v.decode("utf-8", "replace")
        elif fn == 4 and wt == 2:
            events.append(v)
    return name, events


def parse_event(buf):
    mid = dur = 0
    for fn, wt, v in fields(buf):
        if fn == 1 and wt == 0:
            mid = v
        elif fn == 3 and wt == 0:
            dur = v
    return mid, dur


def summarize(path, top_n=30, by_cat=False, include_async=False):
    if os.path.isdir(path):
        cands = sorted(glob.glob(os.path.join(
            path, "**", "*.xplane.pb"), recursive=True))
        if not cands:
            raise SystemExit(f"no xplane.pb under {path}")
        path = cands[-1]
    data = open(path, "rb").read()
    print(f"# {path} ({len(data)/1e6:.1f} MB)")
    for fn, wt, v in fields(data):
        if fn != 1 or wt != 2:
            continue
        pname, lines, meta = parse_plane(v)
        if "TPU" not in pname and "/device:" not in pname.lower():
            continue
        tot = defaultdict(int)
        cnt = defaultdict(int)
        dropped = 0
        for lbuf in lines:
            lname, events = parse_line(lbuf)
            if "XLA Ops" not in lname:
                continue
            for ebuf in events:
                mid, dur = parse_event(ebuf)
                nm = meta.get(mid, str(mid))
                if not include_async and nm.lstrip("%").startswith(_ASYNC):
                    dropped += dur
                    continue
                key = _category(nm) if by_cat else nm
                tot[key] += dur
                cnt[key] += 1
        if not tot:
            continue
        ssum = sum(tot.values()) / 1e12
        note = "" if include_async else (
            f" (excl. {dropped/1e12:.3f}s overlapped async DMA)")
        print(f"\n== {pname}: {ssum:.4f} device-seconds in XLA ops{note} ==")
        for nm, d in sorted(tot.items(), key=lambda kv: -kv[1])[:top_n]:
            sec = d / 1e12
            print(f"{sec:9.5f}s {100*sec/ssum:5.1f}% {cnt[nm]:5d}x  {nm[:95]}")


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    summarize(args[0] if args else "/tmp/prof",
              int(args[1]) if len(args) > 1 else 30,
              by_cat="--cat" in sys.argv, include_async="--all" in sys.argv)
