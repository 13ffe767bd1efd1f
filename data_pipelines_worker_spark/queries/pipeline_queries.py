"""End-to-end compiler query: a full pipeline run (spec → stages → result)
checked against a closed-form DuckDB oracle.

The pipeline is the reference's yt-short spine (fan-out of
``$.segments[*].text`` → wrap_text → array_input gather → join_strings) fed
with a transcription document built from ``documents.doc_id = 0``; wrapping
every word with ``- …!`` and joining with spaces equals
``'- ' || replace(text, ' ', '! - ') || '!'``.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.compiler import BlockSpec, InputBinding, PipelineRunner, PipelineSpec
from ..session import load_table
from . import register


def _spine_spec() -> PipelineSpec:
    return PipelineSpec(
        slug="yt-short-spine",
        blocks=[
            BlockSpec(id="upload_file", slug="transcription"),
            BlockSpec(
                id="wrap_text",
                slug="wrap",
                input={"prefix": "- ", "suffix": "!"},
                bindings=[
                    InputBinding(
                        param="text",
                        origin="transcription",
                        json_path="$.segments[*].text",
                    )
                ],
                fan_out=True,
            ),
            BlockSpec(
                id="join_strings",
                slug="join",
                input={"separator": " "},
                bindings=[InputBinding(param="strings", origin="wrap", array_input=True)],
            ),
        ],
    )


@register(
    "pipeline_e2e",
    """
    SELECT CAST(0 AS BIGINT) AS input_index,
           CAST(0 AS BIGINT) AS output_index,
           '- ' || replace(text, ' ', '! - ') || '!' AS payload_str
    FROM documents WHERE doc_id = 0
    """,
)
def q_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    doc = load_table(spark, sf_dir, "documents").where(F.col("doc_id") == 0)
    transcription_json = doc.select(
        F.to_json(
            F.struct(
                F.transform(
                    F.split("text", " ", -1), lambda w: F.struct(w.alias("text"))
                ).alias("segments")
            )
        ).alias("j")
    ).first()[0]
    runner = PipelineRunner(spark, tempfile.mkdtemp(prefix="dpws_stages_"))
    res = runner.run(
        _spine_spec(), request_input={"transcription": {"file": transcription_json}}
    )
    return res.output.select("input_index", "output_index", "payload_str")
