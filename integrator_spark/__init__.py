"""integrator_spark — a PySpark-native data-integration & analytics engine.

A brand-new engine with the query and data-processing capabilities of
CEDAR-project/Integrator (a harmonization/ETL pipeline whose query
surface is relational — see SURVEY.md; the reference checkout at
/root/reference was empty, so the capability surface is reconstructed
from the driver spec + published CEDAR literature, per SURVEY.md §0).

Architecture: pure DataFrame transformations + Spark SQL. Catalyst is
the optimizer (predicate pushdown, column pruning, join selection, AQE);
this package contributes the operator programs, a typed loader, the
LLM-data-pipeline operators (dedup, similarity search, text analysis,
multimodal), and a streaming layer — no custom Catalyst rules.
"""

__version__ = "0.1.0"

import os as _os


def _disable_numpy_thp_madvise() -> None:
    """Turn off numpy's MADV_HUGEPAGE hint on large allocations.

    numpy madvises transparent hugepages for buffers >= 4 MiB when
    /sys/.../transparent_hugepage is in ``madvise`` mode. On this
    container's kernel the THP fault path is pathological: first
    touch of a hugepage-madvised numpy buffer measured ~450x slower
    than a plain one (15.98 s vs 0.036 s for a fresh 96 MB fill;
    ctypes malloc+memset and raw mmap of the same size are 0.04-0.14 s
    either way, so it is specifically the THP fault, not page faults
    or zeroing). Every Arrow/pandas kernel that materializes a
    multi-MB temporary paid it — this was the round-11 root cause of
    the "ambient" bench drift (IVFPQ serve, Hamming scan, blocked
    kNN walls varying 2-4x across sessions with identical plans).

    Called at package import so it runs in the driver AND in every
    Python worker (workers import this package when unpickling
    kernel closures, before the kernel allocates). Respects an
    explicit NUMPY_MADVISE_HUGEPAGE=1 from the environment (e.g. on
    a real cluster where THP behaves).
    """
    if _os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0") != "0":
        return
    try:
        try:
            from numpy.core import multiarray as _ma  # numpy 1.x
        except ImportError:
            from numpy._core import multiarray as _ma  # numpy 2.x
        _ma._set_madvise_hugepage(False)
    except Exception:
        pass  # private API moved/absent: the env var still covers
        # workers whose numpy is imported after this module.


_disable_numpy_thp_madvise()
