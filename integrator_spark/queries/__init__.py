"""Query programs — importing this package populates the registry.

One module per operator family from SURVEY.md §2.
"""

from . import tpch  # noqa: F401
