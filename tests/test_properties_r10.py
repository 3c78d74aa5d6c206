"""Property tests for round-10 pure-python algebra (additive to the
round's assurance record; no Spark session needed).

1. The packed doc-stats encoding in ext/dedup._capped_pair_counts:
   pk = nsh * 2^21 + cc must round-trip EXACTLY via shiftright / %
   across the full documented domain (cc <= nsh < 2^42, cc < 2^21) —
   the r10 review caught that float division would corrupt the low
   bits past 2^52, so the property pins the integer paths.
2. envprofile.deep_merge must implement helm coalescing exactly:
   overlay wins on scalars/lists, maps merge recursively, base keys
   absent from the overlay survive, and inputs are never mutated.
"""

from __future__ import annotations

import copy

from hypothesis import given, settings, strategies as st

from cdc_debezium_spark.sources.envprofile import deep_merge, parse_properties

_PK = 1 << 21


@given(
    nsh=st.integers(min_value=0, max_value=(1 << 42) - 1),
    cc_frac=st.integers(min_value=0, max_value=(1 << 21) - 1),
)
@settings(max_examples=500)
def test_doc_stats_pack_roundtrip_exact(nsh, cc_frac):
    cc = min(nsh, cc_frac)  # domain invariant: cc <= nsh
    pk = nsh * _PK + cc
    assert pk >> 21 == nsh
    assert pk % _PK == cc
    # the rejected float path really does corrupt the domain edge —
    # documents why the implementation must use shiftright/%
    if nsh > (1 << 31):
        assert pk < (1 << 63)  # stays in int64 for Spark LongType


_scalars = st.one_of(st.integers(), st.text(max_size=8), st.booleans(), st.none())
_values = st.recursive(
    _scalars,
    lambda kids: st.one_of(
        st.lists(kids, max_size=3),
        st.dictionaries(st.text(max_size=5), kids, max_size=3),
    ),
    max_leaves=12,
)
_maps = st.dictionaries(st.text(max_size=5), _values, max_size=4)


@given(base=_maps, overlay=_maps)
@settings(max_examples=300)
def test_deep_merge_is_helm_coalesce(base, overlay):
    b0, o0 = copy.deepcopy(base), copy.deepcopy(overlay)
    merged = deep_merge(base, overlay)
    assert base == b0 and overlay == o0  # inputs never mutated
    for k in set(base) | set(overlay):
        if k not in overlay:
            assert merged[k] == base[k]
        elif k not in base:
            assert merged[k] == overlay[k]
        elif isinstance(base[k], dict) and isinstance(overlay[k], dict):
            assert merged[k] == deep_merge(base[k], overlay[k])
        else:
            assert merged[k] == overlay[k]  # scalars/lists: overlay wins


@given(base=_maps, overlay=_maps)
@settings(max_examples=100)
def test_deep_merge_right_identity_and_idempotence(base, overlay):
    assert deep_merge(base, {}) == base
    merged = deep_merge(base, overlay)
    assert deep_merge(merged, overlay) == merged  # re-applying overlay is a no-op


@given(
    st.lists(
        st.tuples(
            st.text(
                alphabet=st.characters(
                    whitelist_categories=("Ll", "Lu", "Nd"), max_codepoint=127
                ),
                min_size=1,
                max_size=10,
            ),
            st.text(
                alphabet=st.characters(min_codepoint=33, max_codepoint=126).filter(
                    lambda c: c != "="
                ),
                max_size=10,
            ),
        ),
        max_size=8,
    )
)
@settings(max_examples=200)
def test_parse_properties_roundtrip(pairs):
    text = "\n".join(f" {k} = {v} " for k, v in pairs) + "\n# comment\n\nnoequals\n"
    parsed = parse_properties(text)
    want = {}
    for k, v in pairs:  # later keys win, like java.util.Properties
        if k.startswith("#"):
            continue
        want[k] = v
    assert parsed == want
