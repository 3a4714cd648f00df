"""Summarize a jax.profiler trace (xplane.pb): device-time by op category.

The roofline-gap write-ups in README's perf section are produced with this
tool; `bench.py --profile DIR` captures the trace, then:

    PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
        python scripts/analyze_profile.py DIR [--top 25] [--hlo FILE]

(tensorboard_plugin_profile's converter is broken against this TF build —
its pywrap lacks xspace_to_tools_data — so this parses the XPlane proto
directly via tensorflow.tsl and aggregates the ``XLA Ops`` line.)

``--hlo FILE`` (from ``bench.py --dump-hlo``) joins each profiled
``%fusion.N`` against its fused computation body: on TPU the convolutions
and matmuls live INSIDE fusion ops, so the name-only category table calls
a conv-dominated program "fused elementwise".  With the join, fusions whose
body contains a convolution/dot are reported as ``convolution (fused)`` /
``matmul/dot (fused)`` — the honest compute-vs-memory split.
"""

import argparse
import collections
import glob
import os
import re
import sys


def find_xplane(path: str) -> str:
    if os.path.isfile(path):
        return path
    hits = sorted(glob.glob(os.path.join(path, "**", "*.xplane.pb"),
                            recursive=True))
    if not hits:
        sys.exit(f"no *.xplane.pb under {path}")
    return hits[-1]


CATEGORIES = (
    ("convolution", re.compile(r"convolution|conv_general", re.I)),
    ("matmul/dot", re.compile(r"\bdot\b|dot_general|einsum", re.I)),
    ("reduce/pool (SE pools etc.)", re.compile(r"reduce|pool", re.I)),
    ("rng", re.compile(r"rng|threefry|bit_generator", re.I)),
    ("transpose/copy/layout", re.compile(r"transpose|copy|bitcast|reshape",
                                         re.I)),
    ("pallas custom-call", re.compile(r"custom-call|tpu_custom_call|_pallas",
                                      re.I)),
    ("collectives", re.compile(r"all-reduce|all-gather|reduce-scatter|"
                               r"collective-permute", re.I)),
    ("fused elementwise", re.compile(r"fusion", re.I)),
)


def categorize(full: str, fusion_kind=None) -> str:
    # metadata carries the whole HLO instruction text; classify on the op
    # NAME only (left of ' = ') so operand names like %copy-done don't
    # mis-attribute the op, with named-fusion prefixes (convert_reduce_
    # fusion, convolution_convert_fusion, ...) winning over bare 'fusion'
    name = full.split(" = ", 1)[0].lstrip("%").strip()
    if fusion_kind:
        k = fusion_kind.get(name)
        if k == "conv":
            return "convolution (fused)"
        if k == "dot":
            return "matmul/dot (fused)"
    for cat, rx in CATEGORIES:
        if rx.search(name):
            return cat
    return "other"


_SHAPE_RX = re.compile(r"(bf16|f32|f16|s8|s32|u8|u32|pred|s16|u16)\[([\d,]*)\]")
_BYTES = {"bf16": 2, "f16": 2, "f32": 4, "s8": 1, "u8": 1, "pred": 1,
          "s16": 2, "u16": 2, "s32": 4, "u32": 4}


def _numel(dims: str) -> int:
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n


def _shape_bytes(m) -> int:
    return _numel(m.group(2)) * _BYTES[m.group(1)]


_OPERANDS_RX = re.compile(r"%([\w.\-]+)")


def _operand_names(rhs: str, op: str):
    """Operand instruction names inside ``op(...)``'s paren group (the
    declared shape's tiling annotation ``{..:T(8,128)(2,1)}`` also has
    parens, so start at the op keyword, not the first paren)."""
    at = rhs.find(op + "(")
    if at < 0:
        return []
    depth = 0
    start = at + len(op) + 1
    for i in range(at + len(op), len(rhs)):
        ch = rhs[i]
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                return _OPERANDS_RX.findall(rhs[start:i])
    return []


def _conv_flops(body: str, ker_shape) -> int:
    """2 * numel(out) * (kh*kw*Cin/groups): output shape is the
    instruction's declared shape; ``ker_shape`` is the resolved second
    operand (dtype, dims-string)."""
    out = _SHAPE_RX.search(body)
    if not out or not ker_shape:
        return 0
    ker_dims = [int(d) for d in ker_shape[1].split(",") if d]
    lbl = re.search(r"dim_labels=\S*_(\S+?)->", body)
    groups = re.search(r"feature_group_count=(\d+)", body)
    g = int(groups.group(1)) if groups else 1
    if lbl:
        # kernel labels e.g. 01io / io01: 'o' marks the out-channel dim;
        # contraction size = prod(all kernel dims except 'o')
        red = 1
        for ch, d in zip(lbl.group(1), ker_dims):
            if ch != "o":
                red *= d
    else:
        red = 1
        for d in ker_dims[:-1]:
            red *= d
    return 2 * _numel(out.group(2)) * red // g


def _dot_flops(body: str, lhs_shape) -> int:
    out = _SHAPE_RX.search(body)
    if not out or not lhs_shape:
        return 0
    lhs_dims = [int(d) for d in lhs_shape[1].split(",") if d]
    m = re.search(r"lhs_contracting_dims=\{([\d,]*)\}", body)
    red = 1
    if m:
        for i in m.group(1).split(","):
            if i:
                red *= lhs_dims[int(i)]
    # batch dims are in both lhs and out; 2*numel(out)*red covers them
    return 2 * _numel(out.group(2)) * red


def parse_hlo_roofline(path: str):
    """Per-op FLOPs + operand/result bytes from optimized-HLO text: maps
    each fusion/conv/dot op name -> flops / bytes.  Optimized HLO names
    operands without inline shapes, so pass 1 builds a name->shape table
    (instruction declared shapes + fused-computation parameter lists);
    pass 2 computes conv/dot FLOPs (kernel/lhs shape looked up by operand
    name) and attributes each fused computation's FLOPs to the fusion op
    that calls it.  Bytes are the op's own result + operand shapes — the
    HBM traffic a perfectly-fused op must still move.

    Returns ``(flops, op_bytes, int8_ops)``: the third item is the set of
    op names whose conv/dot contracts s8 operands (the PTQ serving path,
    ops/quant.py) — those ops are measured against the int8 TOP/s
    speed-of-light, not the bf16 one (VERDICT r4 #4)."""
    shape_of = {}
    lines_by_comp = []          # (comp, name, body)
    cur = None
    def_rx = re.compile(r"^(?:ROOT )?%(\S+)\s*\((.*)\)\s*->.*\{\s*$")
    param_rx = re.compile(r"([\w.\-]+):\s*(bf16|f32|f16|s8|s32|u8|u32|pred|"
                          r"s16|u16)\[([\d,]*)\]")
    call_rx = re.compile(r"calls=%([\w.\-]+)")
    with open(path) as fh:
        for raw in fh:
            m = def_rx.match(raw)
            if m:
                cur = m.group(1)
                for pm in param_rx.finditer(m.group(2)):
                    shape_of[pm.group(1)] = (pm.group(2), pm.group(3))
                continue
            if raw.startswith("}"):
                cur = None
                continue
            s = raw.strip()
            if s.startswith("ROOT "):
                s = s[5:].strip()
            if not s.startswith("%") or " = " not in s:
                continue
            name = s.split(" = ", 1)[0].lstrip("%").strip()
            sh = _SHAPE_RX.search(s.split(" = ", 1)[1])
            if sh:
                shape_of[name] = (sh.group(1), sh.group(2))
            lines_by_comp.append((cur, name, s))

    comp_flops = collections.Counter()
    comp_int8 = set()
    fusion_comp = {}
    flops = {}
    op_bytes = {}
    int8_ops = set()

    def _is_s8(op_name):
        sh = shape_of.get(op_name)
        return bool(sh) and sh[0] in ("s8", "u8")

    def _io_bytes(name, rhs, kw):
        total = 0
        own = shape_of.get(name)
        if own:
            total += _numel(own[1]) * _BYTES[own[0]]
        for op in _operand_names(rhs, kw):
            sh = shape_of.get(op)
            if sh:
                total += _numel(sh[1]) * _BYTES[sh[0]]
        return total

    for comp, name, body in lines_by_comp:
        rhs = body.split(" = ", 1)[1]
        if " convolution(" in rhs:
            ops = _operand_names(rhs, "convolution")
            fl = _conv_flops(body, shape_of.get(ops[1]) if len(ops) > 1
                             else None)
            comp_flops[comp] += fl
            flops[name] = fl
            op_bytes[name] = _io_bytes(name, rhs, "convolution")
            if len(ops) > 1 and _is_s8(ops[1]):
                int8_ops.add(name)
                comp_int8.add(comp)
        elif " dot(" in rhs:
            ops = _operand_names(rhs, "dot")
            fl = _dot_flops(body, shape_of.get(ops[0]) if ops else None)
            comp_flops[comp] += fl
            flops[name] = fl
            op_bytes[name] = _io_bytes(name, rhs, "dot")
            if ops and _is_s8(ops[0]):
                int8_ops.add(name)
                comp_int8.add(comp)
        elif " fusion(" in rhs:
            c = call_rx.search(rhs)
            if c:
                fusion_comp[name] = c.group(1)
            op_bytes[name] = _io_bytes(name, rhs, "fusion")
    for name, comp in fusion_comp.items():
        flops[name] = comp_flops.get(comp, 0)
        if comp in comp_int8:
            int8_ops.add(name)
    return flops, op_bytes, int8_ops


def parse_hlo_fusion_kinds(path: str):
    """Map each fusion op's bare name to 'conv'/'dot' when its fused
    computation contains a convolution/dot (optimized-HLO text from
    ``bench.py --dump-hlo``)."""
    comp_kind = {}
    fusion_comp = {}
    cur = None
    def_rx = re.compile(r"^%(\S+)\s*\(.*\{\s*$")
    call_rx = re.compile(r"calls=%([\w.\-]+)")
    with open(path) as fh:
        for line in fh:
            m = def_rx.match(line)
            if m:
                cur = m.group(1)
                continue
            if line.startswith("}"):
                cur = None
                continue
            s = line.strip()
            if s.startswith("ROOT "):
                s = s[5:].strip()
            if cur is not None and s.startswith("%"):
                if " convolution(" in s or s.split(" = ", 1)[-1].startswith(
                        "convolution("):
                    comp_kind[cur] = "conv"
                elif " dot(" in s and comp_kind.get(cur) != "conv":
                    comp_kind[cur] = "dot"
            if " fusion(" in s and " = " in s:
                name = s.split(" = ", 1)[0].lstrip("%").strip()
                c = call_rx.search(s)
                if c:
                    fusion_comp[name] = c.group(1)
    return {
        name: comp_kind[comp]
        for name, comp in fusion_comp.items() if comp in comp_kind
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("path", help="profile dir (from bench.py --profile) or "
                                 "an .xplane.pb file")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--hlo", default=None,
                    help="optimized-HLO text from bench.py --dump-hlo; "
                         "classifies fusions containing conv/dot honestly")
    ap.add_argument("--roofline", action="store_true",
                    help="with --hlo: per-op roofline table — FLOPs from "
                         "the conv/dot shapes inside each fusion, bytes "
                         "from its operand/result shapes, bound = "
                         "max(flops/SOL, bytes/BW) vs measured self-time")
    ap.add_argument("--sol-tflops", type=float, default=156.0,
                    help="compute speed-of-light (measured conv SOL here: "
                         "bf16 156 TFLOP/s; v5e peak 197)")
    ap.add_argument("--sol-int8-tops", type=float, default=265.0,
                    help="int8 compute speed-of-light for ops whose "
                         "conv/dot contracts s8 operands (measured conv "
                         "SOL here: 265 TOP/s; v5e peak 394)")
    ap.add_argument("--hbm-gbps", type=float, default=819.0,
                    help="HBM bandwidth bound (v5e: 819 GB/s)")
    args = ap.parse_args()
    fusion_kind = parse_hlo_fusion_kinds(args.hlo) if args.hlo else None
    roofline = (parse_hlo_roofline(args.hlo)
                if (args.hlo and args.roofline) else None)

    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    f = find_xplane(args.path)
    xs = xplane_pb2.XSpace()
    with open(f, "rb") as fh:
        xs.ParseFromString(fh.read())

    for plane in xs.planes:
        if not plane.name.startswith("/device:TPU"):
            continue
        meta = {k: v.name for k, v in plane.event_metadata.items()}
        by_op = collections.Counter()
        n_ev = collections.Counter()
        total_ps = 0
        module_ps = 0
        for line in plane.lines:
            if line.name == "XLA Modules":
                module_ps += sum(e.duration_ps for e in line.events)
            if line.name != "XLA Ops":
                continue
            for e in line.events:
                name = meta.get(e.metadata_id, str(e.metadata_id))
                by_op[name] += e.duration_ps
                n_ev[name] += 1
                total_ps += e.duration_ps
        if not by_op:
            continue
        print(f"== {plane.name}  (file: {os.path.basename(f)})")
        print(f"   XLA Modules wall: {module_ps/1e9:.3f} ms   "
              f"sum of op self-times: {total_ps/1e9:.3f} ms")
        by_cat = collections.Counter()
        for name, ps in by_op.items():
            by_cat[categorize(name, fusion_kind)] += ps
        print("   -- by category --")
        for cat, ps in by_cat.most_common():
            print(f"   {100.0*ps/total_ps:5.1f}%  {ps/1e9:10.3f} ms  {cat}")
        print(f"   -- top {args.top} ops --")
        for name, ps in by_op.most_common(args.top):
            print(f"   {100.0*ps/total_ps:5.1f}%  {ps/1e9:10.3f} ms  "
                  f"x{n_ev[name]:<6} {name[:110]}")
        if roofline is None:
            continue
        flops_map, bytes_map, int8_ops = roofline
        print(f"   -- roofline (top {args.top} by time; SOL "
              f"{args.sol_tflops:.0f} bf16 TFLOP/s / "
              f"{args.sol_int8_tops:.0f} int8 TOP/s, HBM "
              f"{args.hbm_gbps:.0f} GB/s) --")
        print("   pct_time    ms/exec   TFLOP/s     GB/s  bound  "
              "pct_of_bound  op")
        tot_flops = tot_bound_ps = covered_ps = 0
        for name, ps in by_op.most_common(args.top):
            bare = name.split(" = ", 1)[0].lstrip("%").strip()
            fl = flops_map.get(bare)
            if fl is None:
                continue
            nb = bytes_map.get(bare, 0)
            sol = (args.sol_int8_tops if bare in int8_ops
                   else args.sol_tflops)
            t_exec = ps / 1e12 / n_ev[name]            # seconds
            t_comp = fl / (sol * 1e12)
            t_mem = nb / (args.hbm_gbps * 1e9)
            t_bound = max(t_comp, t_mem)
            kind = "comp" if t_comp >= t_mem else "mem"
            tag = " i8" if bare in int8_ops else ""
            tot_flops += fl * n_ev[name]
            tot_bound_ps += t_bound * n_ev[name] * 1e12
            covered_ps += ps
            print(f"   {100.0*ps/total_ps:5.1f}%  {t_exec*1e3:9.3f}  "
                  f"{fl/t_exec/1e12:8.1f}  {nb/t_exec/1e9:7.0f}  {kind:>5}  "
                  f"{100.0*t_bound/t_exec:11.0f}%  {bare[:67]}{tag}")
        if covered_ps:
            print(f"   covered: {100.0*covered_ps/total_ps:.1f}% of device "
                  f"time; aggregate pct_of_bound over covered ops: "
                  f"{100.0*tot_bound_ps/covered_ps:.0f}%")


if __name__ == "__main__":
    main()
