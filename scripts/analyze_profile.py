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


def parse_hlo_fusion_kinds(path: str):
    """Map each fusion op's bare name to 'conv'/'dot' when its fused
    computation contains a convolution/dot (optimized-HLO text from
    ``bench.py --dump-hlo``)."""
    comp_kind = {}
    fusion_comp = {}
    cur = None
    def_rx = re.compile(r"^%(\S+)\s*\(.*\{\s*$")
    call_rx = re.compile(r"calls=%(\S+?)[,)\s]")
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
    args = ap.parse_args()
    fusion_kind = parse_hlo_fusion_kinds(args.hlo) if args.hlo else None

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


if __name__ == "__main__":
    main()
