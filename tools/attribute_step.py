"""Join an xprof step trace with the dumped optimized HLO to attribute
device time to semantic cost centers (conv / matmul / norm-stats / relayout
/ scan / attention) and to model-module paths.

Inputs: outputs/xprof_step (trace) + outputs/step_hlo.txt (from
tools/dump_step_hlo.py). The trace and HLO must come from the same source
revision so fusion numbering matches.

Usage: python tools/attribute_step.py [steps_in_trace=3]
"""
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from xprof_top import fields, parse_event, parse_line, parse_plane  # noqa: E402

_ASYNC = ("copy-start", "slice-start", "copy-done", "slice-done")

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def trace_totals(path):
    import glob
    cands = sorted(glob.glob(os.path.join(path, "**", "*.xplane.pb"),
                             recursive=True))
    data = open(cands[-1], "rb").read()
    tot = defaultdict(int)
    cnt = defaultdict(int)
    for fn, wt, v in fields(data):
        if fn != 1 or wt != 2:
            continue
        pname, lines, meta = parse_plane(v)
        if "TPU" not in pname:
            continue
        for lbuf in lines:
            lname, events = parse_line(lbuf)
            if "XLA Ops" not in lname:
                continue
            for ebuf in events:
                mid, dur = parse_event(ebuf)
                nm = meta.get(mid, str(mid)).lstrip("%").split(" = ")[0]
                if nm.startswith(_ASYNC):
                    continue
                tot[nm] += dur
                cnt[nm] += 1
    return tot, cnt


def parse_hlo(path):
    """op name -> dict(defline, op_name metadata, called computation)."""
    ops = {}
    comp_bodies = defaultdict(list)   # computation name -> list of op kinds
    cur_comp = None
    comp_re = re.compile(r"^(%[\w.\-]+)\s*(?:\([^)]*\))?.*\{\s*(//.*)?$")
    def_re = re.compile(r"^\s*(?:ROOT\s+)?%([\w.\-]+)\s*=\s*(.*)$")
    for line in open(path):
        m = comp_re.match(line)
        if line and not line[0].isspace() and m:
            cur_comp = m.group(1).lstrip("%")
            continue
        m = def_re.match(line)
        if not m:
            continue
        name, rest = m.group(1), m.group(2)
        kind_m = re.match(r"[^=]*?\s([a-z][\w\-]*)\(", rest)
        kind = kind_m.group(1) if kind_m else "?"
        if cur_comp:
            comp_bodies[cur_comp].append((kind, rest))
        opn_m = re.search(r'op_name="([^"]*)"', rest)
        calls_m = re.search(r"calls=%([\w.\-]+)", rest)
        ops[name] = {
            "rest": rest,
            "op_name": opn_m.group(1) if opn_m else "",
            "calls": calls_m.group(1) if calls_m else None,
            "conv_cfg": '"window_config"' in rest,
        }
    return ops, comp_bodies


def classify(name, info, comp_bodies):
    if name.startswith("ssm_scan"):
        return "scan-kernel"
    if name.startswith("flash_attention"):
        return "flash-attn"
    if name.startswith("copy"):
        return "copy/relayout"
    body = comp_bodies.get(info["calls"], []) if info and info["calls"] else []
    kinds = [k for k, _ in body]
    has_stats = "reduce" in kinds
    is_spatial_conv = any(
        k == "convolution" and "window={size=1x1" not in r
        and "window=" in r for k, r in body)
    if name.startswith("convolution") or is_spatial_conv:
        return "conv+stats" if has_stats else "conv"
    if "dot" in kinds or "convolution" in kinds:
        # 1x1 convolutions are matmuls in disguise
        return "matmul+stats" if has_stats else "matmul"
    if has_stats:
        # pure stats fusions (no matmul/conv): GN/LN statistics
        return "norm-stats"
    if "transpose" in kinds or "bitcast" in name or "copy" in kinds:
        return "relayout/eltwise"
    if not kinds:
        return name.split(".")[0]
    return "eltwise"


def module_of(op_name):
    parts = op_name.split("/")
    parts = [p for p in parts if p and not p.startswith("jit(")]
    if parts and parts[0] == "UNetSpatioTemporalCondition":
        parts = parts[1:]
    keep = parts[:4] if (len(parts) > 1 and "attention" in parts[1]) \
        else parts[:2]
    return "/".join(keep) if keep else "(none)"


def main():
    prod = "--prod" in sys.argv
    pos = [a for a in sys.argv[1:] if not a.startswith("--")]
    steps = float(pos[0]) if pos else 3.0
    tot, cnt = trace_totals(os.path.join(
        ROOT, "outputs", "xprof_step_576" if prod else "xprof_step"))
    ops, comp_bodies = parse_hlo(os.path.join(
        ROOT, "outputs", "step_hlo_576.txt" if prod else "step_hlo.txt"))

    by_class = defaultdict(int)
    by_module = defaultdict(int)
    by_class_mod = defaultdict(int)
    unmatched = 0
    rows = []
    for nm, d in tot.items():
        info = ops.get(nm)
        if info is None:
            unmatched += d
        cls = classify(nm, info, comp_bodies)
        opn = info["op_name"] if info else ""
        mod = module_of(opn)
        by_class[cls] += d
        by_module[mod] += d
        by_class_mod[(cls, mod)] += d
        rows.append((d, nm, cls, mod))

    ssum = sum(tot.values()) / 1e12
    print(f"total {ssum:.3f}s in trace; per step {ssum/steps*1e3:.1f} ms; "
          f"unmatched-to-HLO {unmatched/1e12/steps*1e3:.1f} ms/step\n")
    print("== by class (ms/step) ==")
    for k, d in sorted(by_class.items(), key=lambda kv: -kv[1]):
        print(f"{d/1e12/steps*1e3:9.2f}  {k}")
    print("\n== by module (ms/step, top 25) ==")
    for k, d in sorted(by_module.items(), key=lambda kv: -kv[1])[:25]:
        print(f"{d/1e12/steps*1e3:9.2f}  {k}")
    print("\n== heaviest (class, module) (ms/step, top 30) ==")
    for (c, m), d in sorted(by_class_mod.items(), key=lambda kv: -kv[1])[:30]:
        print(f"{d/1e12/steps*1e3:9.2f}  {c:16s} {m}")
    print("\n== heaviest individual ops (ms/step, top 40) ==")
    for d, nm, cls, mod in sorted(rows, reverse=True)[:40]:
        print(f"{d/1e12/steps*1e3:9.2f}  {cls:16s} {nm:34s} {mod}")


if __name__ == "__main__":
    main()
