"""deployment_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference vector-database deployment
suite (CPP-Network-Vector-Database/Deployment).

The reference (see SURVEY.md) is a FAISS/Milvus CRUD + top-k ANN benchmark
over network packet-flow data. This package re-expresses that surface —
scans, cleaning, text serialization, embedding, exact and approximate
top-k similarity search, CRUD snapshot maintenance, metrics — as idiomatic
Spark DataFrame / SQL / Structured Streaming programs, plus the
training-data-pipeline operators (dedup, similarity search, text analysis,
multimodal plumbing) such an engine needs at 100 TB scale.

Nothing here is a port: the reference is pandas/faiss/milvus single-node
Python; every operator below is declared against Catalyst so predicate
pushdown, column pruning, partial aggregation, broadcast joins, AQE and
whole-stage codegen apply.
"""

from deployment_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
