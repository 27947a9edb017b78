"""Unit fence for the host-quiescence canary (r11, VERDICT r10 ask #5)."""

from __future__ import annotations


def test_host_canary_trend_rule(monkeypatch):
    """The quiescence canary (r11) must flag exactly the r10 incident
    shape — strictly rising samples past the ratio threshold — and not
    flat-but-jittery hosts; strict mode refuses instead of warning."""
    import pytest

    from tools import host_canary

    def scripted(vals):
        it = iter(vals)
        monkeypatch.setattr(host_canary, "_fixed_work", lambda: next(it))

    scripted([0.25, 0.26, 0.255])  # jitter, not monotone
    assert not host_canary.run_canary()["trending_up"]
    scripted([0.25, 0.26, 0.27])  # monotone but under the ratio
    assert not host_canary.run_canary()["trending_up"]
    scripted([0.25, 0.33, 0.50])  # the incident shape
    c = host_canary.run_canary()
    assert c["trending_up"] and c["ratio"] == 2.0
    # warn path returns the dict; strict path refuses
    scripted([0.25, 0.33, 0.50])
    assert host_canary.gate_or_warn("t")["trending_up"]
    scripted([0.25, 0.33, 0.50])
    monkeypatch.setenv("SPARK_GRAFT_CANARY_STRICT", "1")
    with pytest.raises(SystemExit):
        host_canary.gate_or_warn("t")
