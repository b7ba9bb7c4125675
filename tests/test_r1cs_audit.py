"""The residual audit must stay green: every circom `===` /
ForceEqualIfEnabled site in the reference maps to a residual, a
composed chain, or a by-construction assignment — and every claimed
residual anchor actually exists in the repo."""

from circuits_tpu.r1cs.audit import audit, parse_reference_sites, MANIFEST


def test_bidirectional_audit():
    a = audit()
    assert a["missing_sites"] == []
    assert a["dead_entries"] == []
    assert a["bad_anchors"] == []


def test_site_parse_is_nonempty_and_manifest_complete():
    sites = parse_reference_sites()
    assert len(sites) >= 40  # the reference has 46 constraint sites
    assert set(sites) == set(MANIFEST)
