"""ES ILM (index lifecycle management) analog over rollover generations.

The reference leaves index size/lifecycle entirely to its ES backend
(it writes to one configured index name — reference
core/elasticsearch.py:322 — and assumes ES rollover/ILM bounds it).
This is that policy engine for the RolloverIndex alias
(index/rollover.py):

* **hot** — the newest ``warm_after_generations`` generations (plus any
  unsealed one) serve as-is; rollover's ``max_docs`` write condition is
  the hot-phase action.
* **warm** — older SEALED generations are SHRUNK
  (``index/shrink.py::shrink_index`` — factor-merge of term
  partitions): fewer, larger parts mean cheaper per-query fan-out for
  generations that no longer take writes. Rank identity under shrink
  is pinned by the shrink tests; the alias swap is crash-ordered
  (shrink fully writes the ``-warm`` dir → alias meta saves pointing at
  it → only then is the old dir removed, so a crash at any point leaves
  a valid alias plus at worst an orphan directory).
* **delete** — generations beyond ``delete_keep_last`` are pruned
  (``RolloverIndex.prune``; unsealed generations are never deleted).

Scale note: every action is per-generation and bounded by ``max_docs``
— the policy never touches more than one generation's data at a time,
exactly the property that keeps ILM viable at 10^12 total docs.
"""

from __future__ import annotations

import shutil
from dataclasses import dataclass

from .rollover import RolloverIndex
from .shrink import shrink_index


@dataclass(frozen=True)
class IlmPolicy:
    """Declarative phase conditions (the ES policy JSON analog)."""

    # newest K generations stay hot (never warm-shrunk)
    warm_after_generations: int = 1
    # term-partition merge factor for the warm shrink
    warm_shrink_factor: int = 2
    # delete phase: keep only the most recent K generations
    # (None = delete phase disabled)
    delete_keep_last: int | None = None


def apply_policy(roll: RolloverIndex, policy: IlmPolicy) -> dict:
    """One policy pass over the alias; idempotent (a generation already
    in warm phase is skipped; prune of already-pruned generations is a
    no-op). Returns {"delete": [names], "warm": [new names]}."""
    if policy.warm_after_generations < 0:
        raise ValueError("warm_after_generations must be >= 0")
    actions: dict = {"delete": [], "warm": []}
    # delete first — never shrink a generation about to be dropped
    if policy.delete_keep_last is not None:
        actions["delete"] = roll.prune(keep_last=policy.delete_keep_last)
    gens = roll.meta["generations"]
    k = policy.warm_after_generations
    eligible = gens[:-k] if k else list(gens)
    for g in eligible:
        if not g["sealed"] or g.get("phase") == "warm":
            continue
        src = roll._gen_dir(g["name"])
        dst = src + "-warm"
        shrink_index(src, dst, policy.warm_shrink_factor)
        g["name"] = g["name"] + "-warm"
        g["phase"] = "warm"
        roll._save()          # alias now points at the shrunk dir...
        roll._engines = None
        shutil.rmtree(src, ignore_errors=True)  # ...then drop the old
        actions["warm"].append(g["name"])
    return actions
