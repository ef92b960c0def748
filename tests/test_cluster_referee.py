"""Union-find referee vs the registered recursive-CTE oracles
(VERDICT r6 #2).

driver_sim's `--referee` mode value-checks the dedup-cluster family
(dedup_clusters, dedup_clusters_twostar, dedup_keep_best,
dedup_cluster_size_histogram) against a pure-Python union-find over the
oracle's own edge list, because the CTE's recursive transitive closure
is intractable at sf>=1 (~26 min per sibling at sf1 for ~25 s of Spark
work). These tests pin the referee hash-identical to the CTE at the two
tiers where the CTE IS tractable — sf0.01 (the driver's gate tier) and
sf0.1 (the bench tier) — which licenses substituting it for sf>=1
sweeps. The registered oracles themselves are untouched: the driver
contract still carries the CTE.

No SparkSession needed: both sides here are DuckDB + stdlib, so this
also cross-checks the referee independently of the engine.
"""

from __future__ import annotations

import duckdb
import pytest

# Referee suite: long-tail tier (VERDICT r12 #2) — deselected from the
# default fast tier; runs builder-side with -m "slow or not slow".
pytestmark = pytest.mark.slow


from driver_sim import CLUSTER_REFEREE, cluster_referee_frames
from data_pipelines_course_spark.queries import all_oracles, load_registry


def _sorted_rows(df) -> list[tuple]:
    # Compare python-native values, not reprs: numpy scalar reprs vary
    # by dtype (int32 vs int64) and numpy version ('5' vs 'np.int64(5)'),
    # so a duckdb/pandas dtype shift would fail spuriously (ADVICE r7).
    cols = sorted(df.columns)
    return sorted(map(tuple, df[cols].astype(object).values.tolist()))


# At sf0.1 only the base clustering is re-pinned: each sibling's CTE
# re-pays the same ~53 s recursive closure (4x = the exact cost this
# referee exists to avoid), and the siblings are pure derivations of
# that closure — their derivation logic is fully pinned at sf0.01.
@pytest.mark.parametrize("sf,names", [
    ("0.01", CLUSTER_REFEREE),
    ("0.1", ("dedup_clusters",)),
])
def test_referee_matches_cte_oracles(sf, names):
    load_registry()
    oracles = all_oracles()
    con = duckdb.connect()
    con.sql("CREATE VIEW documents AS SELECT * FROM "
            f"'/root/testdata/sf{sf}/documents.parquet'")
    frames = cluster_referee_frames(con)
    assert set(frames) == set(CLUSTER_REFEREE)
    for name in names:
        ref = frames[name]
        cte = con.sql(oracles[name]).df()
        assert sorted(ref.columns) == sorted(cte.columns), name
        assert _sorted_rows(ref) == _sorted_rows(cte), (
            f"{name}: referee diverges from the registered CTE oracle "
            f"at sf{sf}")
        assert len(ref) > 0, f"{name}: degenerate referee result"


def test_union_find_handles_chains_and_merges():
    """Property corner: a long chain (worst case for path compression)
    plus two components merged by a late edge must still label every
    node with the component MINIMUM — the contract the CTE's
    min(r)-per-node encodes."""
    from driver_sim import union_find_components

    chain = [(i, i + 1) for i in range(100, 164)]      # diameter-64 path
    two = [(7, 9), (9, 11), (2, 4)]                     # {7,9,11}, {2,4}
    merge = [(11, 4)]                                   # late merge -> min 2
    comp = union_find_components(chain + two + merge)
    assert all(comp[n] == 100 for n in range(100, 165))
    assert {comp[n] for n in (2, 4, 7, 9, 11)} == {2}
