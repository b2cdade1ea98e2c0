"""The scaling-hunt acceptance gate is the honesty check on the round's
headline artifact — pin its behavior (no Ray needed)."""
import importlib.util
import os

spec = importlib.util.spec_from_file_location(
    "scaling_hunt",
    os.path.join(os.path.dirname(__file__), "..", "tools",
                 "scaling_hunt.py"))
hunt = importlib.util.module_from_spec(spec)
spec.loader.exec_module(hunt)


def _trial(**kw):
    base = dict(eff=0.80, host_ceiling_lo_x=1.0, host_ceiling_hi_x=3.8,
                docs_per_sec_lo=4000.0, mem_bw_gbps_before=6.8,
                mem_bw_gbps_mid=6.9, mem_bw_gbps_after=6.7)
    base.update(kw)
    return base


def test_strict_path_qualifies():
    assert hunt.qualifies(_trial()) == "strict"


def test_stable_path_label():
    assert hunt.qualifies(_trial(docs_per_sec_lo=2000.0)) == "stable"


def test_low_efficiency_rejected():
    assert hunt.qualifies(_trial(eff=0.70)) is None


def test_inflated_efficiency_rejected():
    # eff > 1.02 means the pair straddled windows (hi leg luckier) —
    # never evidence of scaling
    assert hunt.qualifies(_trial(eff=1.10)) is None


def test_host_grant_gate():
    assert hunt.qualifies(_trial(host_ceiling_hi_x=3.0)) is None
    assert hunt.qualifies(_trial(host_ceiling_lo_x=0.5)) is None


def test_bandwidth_flicker_voids_trial():
    # >10% swing across before/mid/after probes = the legs ran in
    # different windows; the ratio is meaningless
    assert hunt.qualifies(_trial(mem_bw_gbps_mid=5.0)) is None
    assert hunt.qualifies(_trial(mem_bw_gbps_after=8.0)) is None


def test_missing_probes_void():
    assert hunt.qualifies(_trial(mem_bw_gbps_before=0)) is None


def test_slow_lo_leg_rejected_entirely():
    assert hunt.qualifies(_trial(docs_per_sec_lo=900.0)) is None


def test_falling_bandwidth_is_conservative_and_accepted():
    # hi leg on a slower bus than lo -> measured eff is a floor
    t = _trial(mem_bw_gbps_before=6.33, mem_bw_gbps_mid=6.13,
               mem_bw_gbps_after=5.51)
    assert hunt.qualifies(t) == "stable-falling"


def test_rising_bandwidth_still_voided():
    # lo throttled / hi free inflates eff (the round-2 false positive)
    t = _trial(mem_bw_gbps_before=5.51, mem_bw_gbps_mid=6.13,
               mem_bw_gbps_after=6.33)
    assert hunt.qualifies(t) is None


def test_vshape_flicker_still_voided():
    t = _trial(mem_bw_gbps_before=6.8, mem_bw_gbps_mid=5.2,
               mem_bw_gbps_after=6.7)
    assert hunt.qualifies(t) is None


def test_cliff_drop_still_voided():
    # a >25% collapse is a regime change, not one window
    t = _trial(mem_bw_gbps_before=8.0, mem_bw_gbps_mid=6.5,
               mem_bw_gbps_after=5.0)
    assert hunt.qualifies(t) is None
