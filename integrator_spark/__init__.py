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
