"""Meta-guard: SURVEY.md §2B (the judged operator inventory) and the
declared registry must never drift apart. Every backticked operator
name in the §2B tables must be registered, and every registered query
must be listed in SURVEY — in both directions, by exact name."""

import pathlib
import re

from java_mapreduce_framework_spark.plans import registry

SURVEY = pathlib.Path(__file__).resolve().parents[1] / "SURVEY.md"


def _survey_declared_names() -> set:
    text = SURVEY.read_text()
    # section 2B runs from its heading to the 2C heading
    sec = text.split("### 2B.")[1].split("### 2C.")[0]
    names = set()
    for line in sec.splitlines():
        if not line.startswith("|"):
            continue
        first_cell = line.split("|")[1]
        # rows may list several ops per cell, either as `a` / `b` or
        # as one span `a / b / c`
        for span in re.findall(r"`([a-z0-9_ /]+)`", first_cell):
            for m in span.split("/"):
                if m.strip():
                    names.add(m.strip())
    return names


def test_survey_2b_matches_registry():
    declared = _survey_declared_names()
    registered = set(registry.registry())
    missing_in_registry = declared - registered
    missing_in_survey = registered - declared
    assert not missing_in_registry, f"in SURVEY 2B but not registered: {sorted(missing_in_registry)}"
    assert not missing_in_survey, f"registered but absent from SURVEY 2B: {sorted(missing_in_survey)}"
