"""Every module-level memo dict must be enrolled in the central registry.

The memo layer's contract (catalog.register_memo / evict_stale_memos) is
what keeps a long-lived Python process from accumulating dead DataFrames,
checkpoint RDDs, and tempdirs across Spark applications (ADVICE r4 #4/#5).
This test makes the contract self-enforcing: it walks every module in the
package, finds every module-level dict whose name ends in ``_MEMO``, and
asserts it is the SAME object as one enrolled in ``_MEMO_REGISTRY`` — so a
future memo added without ``register_memo`` fails here, instead of
reintroducing the leak class in production.
"""

from __future__ import annotations

import importlib
import pkgutil

import kafka_exercise_spark
from kafka_exercise_spark.catalog import _MEMO_REGISTRY


def _walk_modules():
    for info in pkgutil.walk_packages(
        kafka_exercise_spark.__path__, prefix="kafka_exercise_spark."
    ):
        yield importlib.import_module(info.name)


def test_every_module_level_memo_dict_is_registered():
    # import every module FIRST — registration happens at import time, so
    # snapshotting the registry before the walk would miss all of them
    modules = list(_walk_modules())
    registered_ids = {id(memo) for memo, _ in _MEMO_REGISTRY}
    found = []
    unregistered = []
    for mod in modules:
        for name, val in vars(mod).items():
            # convention: module-level served-state caches end in _MEMO
            # (the registry list itself is the one exempt name)
            if not name.endswith("_MEMO") or not isinstance(val, dict):
                continue
            found.append(f"{mod.__name__}.{name}")
            if id(val) not in registered_ids:
                unregistered.append(f"{mod.__name__}.{name}")
    # the package has memos by construction — an empty scan means the
    # walker broke, not that the contract holds
    assert len(found) >= 10, f"memo scan looks broken: {found}"
    assert unregistered == [], (
        "module-level memo dicts not enrolled via catalog.register_memo "
        f"(stale-application eviction will miss them): {unregistered}"
    )


def test_registry_has_no_duplicate_enrollments():
    """Double-registering a memo would run its cleanup twice on evict."""
    ids = [id(memo) for memo, _ in _MEMO_REGISTRY]
    assert len(ids) == len(set(ids))
