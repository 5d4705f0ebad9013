"""Declared query registry (package form).

Round 8 split the 9k-line monolithic ``plans/registry.py`` into one
module per operator family purely for maintainability: every
registration body is verbatim, the import order below reproduces the
original file order exactly (registration order is a record-keeping
lever -- see ``priority``), and ``registry()`` output is identical
(machine-checked by tests/test_survey_registry_sync.py and the full
oracle sweep).
"""

from __future__ import annotations

from .core import (  # noqa: F401
    QuerySpec,
    _REGISTRY,
    oracle_sql,
    queries,
    registry,
)

# family modules register on import -- ORDER MATTERS (mirrors the
# original single-file order; the priority module then re-sorts by
# driver-record staleness)
from . import relational as _relational  # noqa: F401,E402
from . import temporal as _temporal  # noqa: F401,E402
from . import text as _text  # noqa: F401,E402
from . import dedup as _dedup  # noqa: F401,E402
from . import similarity as _similarity  # noqa: F401,E402
from . import multimodal as _multimodal  # noqa: F401,E402
from . import sqlintake as _sqlintake  # noqa: F401,E402
from . import jobapi as _jobapi  # noqa: F401,E402
from . import streaming as _streaming  # noqa: F401,E402
from . import mixed as _mixed  # noqa: F401,E402
from . import ml as _ml  # noqa: F401,E402
from . import closers as _closers  # noqa: F401,E402
from . import round9 as _round9  # noqa: F401,E402
from . import round9b as _round9b  # noqa: F401,E402
from . import round10 as _round10  # noqa: F401,E402
from . import round11 as _round11  # noqa: F401,E402
from . import round12 as _round12  # noqa: F401,E402
from . import priority as _priority  # noqa: F401,E402

# names tests and tooling import from the old flat module
from .closers import _copurchase_pairs, _ULM_MAXLEN  # noqa: F401,E402
from .priority import _record_staleness  # noqa: F401,E402
