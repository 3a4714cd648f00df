"""Debug-suite harness tests (the reference's pre-training smoke checks,
debug_suite.py:7-219, as callable verifications)."""

from dmf_tpu.config import default_parameters
from dmf_tpu.debug_suite import run_debug_suite_fusion, run_debug_suite_single


class TestDebugSuite:
    def test_single_dwi_all_pass(self):
        cfg = default_parameters(mc_passes=4)
        assert run_debug_suite_single(cfg, "dwi")

    def test_single_dce_all_pass(self):
        cfg = default_parameters(mc_passes=4)
        assert run_debug_suite_single(cfg, "dce")

    def test_fusion_all_pass(self):
        cfg = default_parameters(mc_passes=4)
        assert run_debug_suite_fusion(cfg)
