"""Build-once directory fixtures (stream source dirs, kv text dirs).

Staged directories are built under a unique temp name and renamed into
place: a concurrent builder of the same fixture either wins the rename
or discards its copy, so readers never observe a half-written
directory (a bare marker-file protocol is racy between the build and
the marker touch).
"""

from __future__ import annotations

import os
import pathlib
import shutil
import uuid
from collections.abc import Callable


def stage_once(stage: pathlib.Path, build: Callable[[str], None]) -> pathlib.Path:
    """Ensure directory ``stage`` exists, building it at most once.

    ``build(tmp_path)`` must create+populate ``tmp_path``. The rename
    into place is atomic on POSIX; if another process won the race the
    temp copy is dropped and the winner's directory is used.
    """
    if stage.exists():
        return stage
    stage.parent.mkdir(parents=True, exist_ok=True)
    tmp = stage.parent / f".build-{uuid.uuid4().hex[:8]}-{stage.name}"
    build(str(tmp))
    try:
        os.rename(tmp, stage)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)
        if not stage.exists():
            raise
    return stage
