"""Bipartite weighted label propagation (user→item).

Reference: ``apps/lpa/lpa_u2i.h`` (250 LoC; run on the ``lpa_3000``
dataset, ``test/app_tests.sh:421``): a property-graph app over a
bipartite user/item graph with weighted edges.  Semantics re-expressed:

- init: every user and item starts with its own label;
- each round (synchronous): items adopt the weighted-majority label
  of their connected users (edge weight = vote weight, min-label
  tie-break), then users adopt the weighted-majority label of their
  connected items from the just-updated item labels;
- fixed number of rounds.

Spark shape per round: two join+weighted-histogram aggregations, the
same ``max(struct(weight, -label))`` argmax as CDLP — weighted votes
partial-aggregate map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def _weighted_argmax(votes: DataFrame, key: str) -> DataFrame:
    """(key, label, w) → per-key label with max Σw, min-label ties."""
    hist = votes.groupBy(key, "label").agg(F.sum("w").alias("tw"))
    return hist.groupBy(key).agg(
        (-F.max(F.struct(F.col("tw"), (-F.col("label")).alias("neg")))[
            "neg"
        ]).alias("label")
    )


def lpa_u2i(
    user_item_edges: DataFrame,
    max_round: int = 10,
    user_col: str = "user",
    item_col: str = "item",
    weight_col: str = "weight",
) -> tuple[DataFrame, DataFrame]:
    """Returns ``(user_labels(user, label), item_labels(item, label))``
    after ``max_round`` synchronous bipartite rounds.

    ``user_item_edges``: ``(user long, item long, weight double)``;
    user and item id spaces may overlap (tracked separately).
    """
    e = user_item_edges.select(
        F.col(user_col).alias("user"),
        F.col(item_col).alias("item"),
        F.col(weight_col).cast("double").alias("w"),
    ).localCheckpoint(eager=True)
    users = e.select("user").distinct()
    items = e.select("item").distinct()
    ulab = users.select("user", F.col("user").alias("label")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    ilab = items.select("item", F.col("item").alias("label")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    for rnd in range(max_round):
        # items adopt weighted-majority user label
        ivotes = e.join(ulab, "user").select("item", "label", "w")
        new_ilab = (
            items.join(_weighted_argmax(ivotes, "item"), "item", "left")
            .join(ilab.withColumnRenamed("label", "old"), "item")
            .select("item", F.coalesce("label", F.col("old")).alias("label"))
        )
        new_ilab = (new_ilab.localCheckpoint(eager=True) if rnd % 3 == 2
                    else new_ilab.persist(StorageLevel.MEMORY_AND_DISK))
        new_ilab.count()
        ilab.unpersist()
        ilab = new_ilab
        # users adopt weighted-majority item label (updated items)
        uvotes = e.join(ilab, "item").select("user", "label", "w")
        new_ulab = (
            users.join(_weighted_argmax(uvotes, "user"), "user", "left")
            .join(ulab.withColumnRenamed("label", "old"), "user")
            .select("user", F.coalesce("label", F.col("old")).alias("label"))
        )
        new_ulab = (new_ulab.localCheckpoint(eager=True) if rnd % 3 == 2
                    else new_ulab.persist(StorageLevel.MEMORY_AND_DISK))
        new_ulab.count()
        ulab.unpersist()
        ulab = new_ulab
    return ulab, ilab
