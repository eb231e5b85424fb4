"""Cohort digest registrations (rotation policy r11).

Each ``cohort_digest_*`` query unions the one-row result digests of its
member queries (see ``cohort_digest.py``); its oracle is the UNION ALL
of the members' DuckDB digest twins built from the live ``ORACLE``
registry, so a member's oracle edit flows into the digest automatically.
A digest that goes hash-green in a driver round is fresh evidence for
every member simultaneously -- the mechanism that keeps ~240 member
queries inside a bounded evidence-refresh cycle with a 50-slot window.

A member listed in ``cohort_specs.COHORTS`` that is missing from the
registry raises at import: that is the LOUD signal to rerun
``scripts/gen_cohort_specs.py`` after renaming or removing a query.
"""

from __future__ import annotations

from .cohort_specs import COHORTS, SPECS
from .cohort_digest import cohort_oracle, cohort_query
from .registry import ORACLE, QUERIES, register


def _register_all() -> None:
    for cname, members in COHORTS.items():
        missing = [m for m in members if m not in QUERIES or m not in ORACLE]
        if missing:
            raise ImportError(
                f"{cname}: members {missing} no longer in the oracle-backed "
                "registry -- rerun scripts/gen_cohort_specs.py"
            )
        register(cname, oracle=cohort_oracle(members, SPECS))(
            cohort_query(members, SPECS)
        )


_register_all()
