"""Round-5 operator batch.

New analytics/LLM-pipeline keys added in round 5, following the established
batch recipe: each key lands with a DuckDB oracle twin, a plan-quality
sweep entry (automatic — tests/test_plan_quality.py parametrizes over the
registry), and a BASELINE.md row in the same commit.

Cited parity anchor: /root/reference/models (beyond-reference surface —
the reference's dbt project defines no analytics beyond its 12 models;
these keys extend the engine the way its Databricks warehouse would be
used downstream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.readers import load
from . import dround, register
