"""Unit tests for scripts/analyze_profile.py's HLO parsers — the tool that
produces the README roofline tables (VERDICT r3 #3 asks for a documented
per-fusion roofline table; these pin the FLOP/byte math it rests on).

The synthetic HLO below mimics the optimized-text shapes jax dumps on TPU
(tiling annotations in layouts, operands referenced by name without inline
shapes, fused computations with typed parameter lists).
"""

import importlib.util
import os

import pytest

_SCRIPT = os.path.join(os.path.dirname(__file__), os.pardir, "scripts",
                       "analyze_profile.py")


@pytest.fixture(scope="module")
def ap():
    spec = importlib.util.spec_from_file_location("analyze_profile", _SCRIPT)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


_HLO = """\
HloModule jit_step, entry_computation_layout={...}

%fused_computation.1 (param_0.1: bf16[8,16,16,32], param_1.2: bf16[3,3,32,64]) -> bf16[8,16,16,64] {
  %param_0.1 = bf16[8,16,16,32]{3,2,1,0:T(8,128)(2,1)} parameter(0)
  %param_1.2 = bf16[3,3,32,64]{3,2,1,0:T(8,128)(2,1)} parameter(1)
  ROOT %convolution.9 = bf16[8,16,16,64]{3,2,1,0:T(8,128)(2,1)} convolution(%param_0.1, %param_1.2), window={size=3x3 pad=1_1x1_1}, dim_labels=b01f_01io->b01f
}

%fused_computation.2 (param_0.3: f32[128,256], param_1.4: f32[256,512]) -> f32[128,512] {
  %param_0.3 = f32[128,256]{1,0:T(8,128)} parameter(0)
  %param_1.4 = f32[256,512]{1,0:T(8,128)} parameter(1)
  ROOT %dot.5 = f32[128,512]{1,0:T(8,128)} dot(%param_0.3, %param_1.4), lhs_contracting_dims={1}, rhs_contracting_dims={0}
}

%fused_computation.3 (param_0.5: s8[8,16,16,32], param_1.6: s8[3,3,32,64]) -> s32[8,16,16,64] {
  %param_0.5 = s8[8,16,16,32]{3,2,1,0:T(8,128)(4,1)} parameter(0)
  %param_1.6 = s8[3,3,32,64]{3,2,1,0:T(8,128)(4,1)} parameter(1)
  ROOT %convolution.11 = s32[8,16,16,64]{3,2,1,0:T(8,128)} convolution(%param_0.5, %param_1.6), window={size=3x3 pad=1_1x1_1}, dim_labels=b01f_01io->b01f
}

ENTRY %main (p0: bf16[8,16,16,32], p1: bf16[3,3,32,64], p2: f32[128,256], p3: f32[256,512], p4: s8[8,16,16,32], p5: s8[3,3,32,64]) -> (bf16[8,16,16,64], f32[128,512]) {
  %p0 = bf16[8,16,16,32]{3,2,1,0:T(8,128)(2,1)} parameter(0)
  %p1 = bf16[3,3,32,64]{3,2,1,0:T(8,128)(2,1)} parameter(1)
  %p2 = f32[128,256]{1,0:T(8,128)} parameter(2)
  %p3 = f32[256,512]{1,0:T(8,128)} parameter(3)
  %p4 = s8[8,16,16,32]{3,2,1,0:T(8,128)(4,1)} parameter(4)
  %p5 = s8[3,3,32,64]{3,2,1,0:T(8,128)(4,1)} parameter(5)
  %fusion.1 = bf16[8,16,16,64]{3,2,1,0:T(8,128)(2,1)} fusion(%p0, %p1), kind=kOutput, calls=%fused_computation.1
  %fusion.2 = f32[128,512]{1,0:T(8,128)} fusion(%p2, %p3), kind=kOutput, calls=%fused_computation.2
  %fusion.3 = s32[8,16,16,64]{3,2,1,0:T(8,128)} fusion(%p4, %p5), kind=kOutput, calls=%fused_computation.3
  %convolution.66 = bf16[8,16,16,64]{3,2,1,0:T(8,128)(2,1)} convolution(%p0, %p1), window={size=3x3 pad=1_1x1_1}, dim_labels=b01f_01io->b01f
  ROOT %tuple.1 = (bf16[8,16,16,64], f32[128,512]) tuple(%fusion.1, %fusion.2)
}
"""


@pytest.fixture(scope="module")
def hlo_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("hlo") / "mod.hlo"
    p.write_text(_HLO)
    return str(p)


# conv: 2 * numel(out 8*16*16*64) * (3*3*32) = 2*131072*288
_CONV_FLOPS = 2 * (8 * 16 * 16 * 64) * (3 * 3 * 32)
# dot: 2 * numel(out 128*512) * contracted 256
_DOT_FLOPS = 2 * (128 * 512) * 256


def test_fusion_flops_attributed_to_caller(ap, hlo_file):
    flops, _, _ = ap.parse_hlo_roofline(hlo_file)
    assert flops["fusion.1"] == _CONV_FLOPS
    assert flops["fusion.2"] == _DOT_FLOPS


def test_toplevel_conv_flops_via_operand_shape_lookup(ap, hlo_file):
    # %convolution.66's kernel operand (%p1) has no inline shape — the
    # parser must resolve it from the parameter's declared shape
    flops, _, _ = ap.parse_hlo_roofline(hlo_file)
    assert flops["convolution.66"] == _CONV_FLOPS


def test_io_bytes_result_plus_operands(ap, hlo_file):
    _, nbytes, _ = ap.parse_hlo_roofline(hlo_file)
    out_b = 8 * 16 * 16 * 64 * 2
    in_b = 8 * 16 * 16 * 32 * 2 + 3 * 3 * 32 * 64 * 2
    assert nbytes["fusion.1"] == out_b + in_b
    assert nbytes["fusion.2"] == (128 * 512 + 128 * 256 + 256 * 512) * 4


def test_operand_names_skip_tiling_parens(ap):
    rhs = ("bf16[8,16]{1,0:T(8,128)(2,1)} fusion(%a.1, %b-2), kind=kLoop, "
           "calls=%c")
    assert ap._operand_names(rhs, "fusion") == ["a.1", "b-2"]


def test_fusion_kind_join_still_works(ap, hlo_file):
    kinds = ap.parse_hlo_fusion_kinds(hlo_file)
    assert kinds.get("fusion.1") == "conv"
    assert kinds.get("fusion.2") == "dot"


def test_int8_conv_fusion_tagged(ap, hlo_file):
    """An s8-contracting conv (the PTQ serving path) is tagged so the
    roofline uses the int8 TOP/s denominator; bf16/f32 ops are not."""
    flops, _, int8_ops = ap.parse_hlo_roofline(hlo_file)
    assert "fusion.3" in int8_ops
    assert flops["fusion.3"] == _CONV_FLOPS  # same contraction shape
    assert "fusion.1" not in int8_ops
    assert "fusion.2" not in int8_ops
    assert "convolution.66" not in int8_ops
