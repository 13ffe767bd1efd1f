"""Pipeline-spec → DataFrame-program compiler + runner.

The reference's pipeline JSON (config/pipelines/*.json, validated by
config/pipelines_validation_schema.json) is a *logical plan description*:
an ordered list of block instances wired by the ``input_config`` dataflow
algebra (types/dataclasses/block.go:193-401, pipeline.go:204-635). This
module compiles such specs into DataFrame programs:

- every block's inputs are built declaratively (scan of upstream stage →
  JSONPath extraction → fan-out/zip/gather → priority coalesce);
- every block's outputs are materialized to the stage store (checkpoint =
  resume/regenerate substrate, mirroring pipeline_block_data_registry.go);
- control flow the reference keeps above the operator layer (stop
  conditions pipeline.go:439-513, resume :157-201, target-index :358-377)
  runs driver-side between stages.

Catalyst owns everything inside a stage: chained scalar blocks collapse to
one projection, index filters push into the stage-parquet scan.
"""

from __future__ import annotations

import uuid
from dataclasses import dataclass, field
from typing import Any, Callable

from pyspark.sql import Column, DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..functions.json_path import json_path_array, json_path_scalar
from ..functions.strings import (
    format_string_from_object,
    join_strings,
    render_value,
    stop_condition,
    text_replace,
    wrap_text,
)
from ..session import local_df
from ..sources import stage_store
from ..streaming.moderation import ACTIONS, SHORT_FORMS


# --- spec model (mirrors the pipeline JSON schema) --------------------------


@dataclass
class InputBinding:
    """``input_config.property.<param>`` (block.go:256-365)."""

    param: str
    origin: str
    json_path: str | None = None
    array_input: bool = False  # gather all origin outputs as one array
    binary: bool = False  # format:"file" → bind raw payload bytes
    # (CastDataToType, helpers/json_schema.go:69-78)


@dataclass
class BlockSpec:
    """One block instance (types/dataclasses/block.go:17-30)."""

    id: str  # operator type id (block registry key)
    slug: str
    input: dict[str, Any] = field(default_factory=dict)  # static params
    bindings: list[InputBinding] = field(default_factory=list)
    fan_out: bool = False  # input_config.type == "array" (block.go:245-254)
    parallel: bool = True  # per-index parallelism hint (free on Spark)


@dataclass
class PipelineSpec:
    slug: str
    blocks: list[BlockSpec]

    @staticmethod
    def from_json(doc: dict, validate: bool = True) -> "PipelineSpec":
        """Parse (and by default validate) the reference's pipeline JSON.

        Validation mirrors the reference's submit-time gate
        (pipeline_registry.go:63-84 against
        config/pipelines_validation_schema.json + per-block SchemaStrings):
        malformed documents raise :class:`~.validation.SpecValidationError`
        here, not three blocks deep inside a Spark plan. Schema defaults
        (separator, voice, ...) are merged under each block's static input
        (MergeStructs parity, block_wrap_text.go:60-63).
        """
        from .validation import apply_input_defaults, validate_pipeline_doc

        if validate:
            known = set(_OPERATORS) | set(_DF_OPERATORS) | {_MODERATION_FETCH}
            validate_pipeline_doc(doc, known)
        blocks = []
        for b in doc["blocks"]:
            cfg = b.get("input_config") or {}
            props = cfg.get("property") or {}
            bindings = [
                InputBinding(
                    param=param,
                    origin=spec["origin"],
                    json_path=spec.get("json_path"),
                    array_input=bool(spec.get("array_input", False)),
                    binary=spec.get("format") == "file",
                )
                for param, spec in props.items()
            ]
            blocks.append(
                BlockSpec(
                    id=b["id"],
                    slug=b["slug"],
                    input=apply_input_defaults(b["id"], b.get("input") or {}),
                    bindings=bindings,
                    fan_out=cfg.get("type") == "array",
                    parallel=bool(cfg.get("parallel", True)),
                )
            )
        return PipelineSpec(slug=doc["slug"], blocks=blocks)


# --- operator registry ------------------------------------------------------

# An operator takes the bound parameter columns and returns the output value
# column (string). 1→N operators return an array column and set EXPLODES.
OperatorFn = Callable[[dict[str, Column]], Column]

_OPERATORS: dict[str, OperatorFn] = {}
_EXPLODES: set[str] = set()  # operators whose output array fans out 1→N
_STOPS: set[str] = set()  # control operators evaluated driver-side


def operator(name: str, explodes: bool = False, stops: bool = False):
    def deco(fn: OperatorFn) -> OperatorFn:
        _OPERATORS[name] = fn
        if explodes:
            _EXPLODES.add(name)
        if stops:
            _STOPS.add(name)
        return fn

    return deco


def _p(params: dict[str, Column], name: str, default: str = "") -> Column:
    return params.get(name, F.lit(default))


@operator("upload_file")
def _op_upload(params):
    # block_upload_file.go:49-102: identity ingest; empty input is an error
    # (surfaced as NULL here; the runner's status check treats it as failed)
    return F.when(F.length(params["file"]) > 0, params["file"])


@operator("wrap_text")
def _op_wrap(params):
    return wrap_text(params["text"], _p(params, "prefix"), _p(params, "suffix"))


@operator("text_replace")
def _op_replace(params):
    return text_replace(
        params["text"],
        params["old"],
        params["new"],
        _p(params, "prefix"),
        _p(params, "suffix"),
    )


@operator("join_strings")
def _op_join(params):
    sep = params.get("__separator_literal", " ")
    return join_strings(params["strings"], sep if isinstance(sep, str) else " ")


@operator("format_string_from_object")
def _op_format(params):
    # template must be a static literal (compile-time split, like the
    # reference's per-instance template in block input). Array-typed
    # variables (wildcard json_path bindings like $.tags[*]) render joined
    # with ", " (block_format_string_from_object.go:78-85).
    template = params["__template_literal"]
    dtypes = params.get("__dtypes") or {}
    mapping = {
        k: render_value(v, dtypes.get(k, "").startswith("array"))
        for k, v in params.items()
        if not k.startswith("__")
    }
    return format_string_from_object(template, mapping)


@operator("stop_pipeline", stops=True)
def _op_stop(params):
    # value column unused for output; runner evaluates __stop over rows
    return params["data"]


@operator("split_string", explodes=True)
def _op_split(params):
    # beyond-reference utility: 1→N split (audio_chunk's shape for text)
    sep = params.get("__separator_literal", " ")
    return F.split(params["text"], sep if isinstance(sep, str) else " ", -1)


@operator("send_message_tg")
def _op_send_message(params):
    # sink block (block_send_message_telegram.go:80-116): media-first
    # fallback — photo if an image is bound, else video, else plain text.
    # Output is the sent-message JSON; the side effect itself is a
    # foreachPartition/foreachBatch concern outside the plan.
    kind = F.coalesce(
        F.when(params["image"].isNotNull(), F.lit("photo")) if "image" in params else F.lit(None),
        F.when(params["video"].isNotNull(), F.lit("video")) if "video" in params else F.lit(None),
        F.lit("message"),
    )
    return F.to_json(
        F.struct(
            kind.alias("kind"),
            _p(params, "group_id").alias("group_id"),
            _p(params, "text").alias("text"),
        )
    )


@operator("send_moderation_tg")
def _op_send_moderation(params):
    # moderation-request sink (block_send_moderation_telegram.go:141-186):
    # emits the review message; the inline-keyboard metadata
    # (processing/block/index) is the stage row's own key columns. The
    # reviewed payload may arrive as `data` or `text` (flagship spec binds
    # `text`); bound media (image/video/audio) is flagged by kind — the
    # bytes themselves travel by stage reference, not through the message.
    data = params["data"] if "data" in params else params.get("text")
    media = None
    for k in ("image", "video", "audio"):
        if k in params:
            m = F.when(params[k].isNotNull(), F.lit(k))
            media = m if media is None else F.coalesce(media, m)
    gid = _p(params, "group_id")
    fields = [
        F.lit("moderation_request").alias("kind"),
        # present only when the block actually configures a chat: to_json
        # drops null fields, so unset/placeholder ("", "0") specs keep the
        # historical record shape and the transport's default chat applies
        F.when(~gid.cast("string").isin("", "0"), gid).alias("group_id"),
    ]
    if data is not None:
        fields.append(data.cast("string").alias("data"))
    if media is not None:
        fields.append(media.alias("media"))
    return F.to_json(F.struct(*fields))


@operator("subtitles_from_transcription")
def _op_subtitles(params):
    # pure column expression build (functions/subtitles.py); the 15 style
    # params are block *config* → compile-time literals, not data columns
    from ..functions.subtitles import ASS_STYLE_DEFAULTS, subtitles_from_transcription

    cfg = dict(params.get("__block_input") or {})
    style = {k: v for k, v in cfg.items() if k in ASS_STYLE_DEFAULTS}
    return subtitles_from_transcription(
        params["transcription"], str(cfg.get("output_format", "ass")), **style
    )


# --- DataFrame-level operators (media / external: Arrow-batched stages) -----

#: Canonical stage columns (SURVEY §7 stage schema; mirrors
#: pipeline_block_data_registry.go:296-297 payload + mime-extension layout).
_STAGE_COLS = ("input_index", "output_index", "payload_str", "payload_bin", "mime")

# fn(runner, df, block) -> DataFrame carrying input_index (+ optionally
# output_index / payload_str / payload_bin / mime); missing canonical
# columns are null-filled by _canonical().
_DF_OPERATORS: dict[str, Callable[["PipelineRunner", DataFrame, "BlockSpec"], DataFrame]] = {}


def df_operator(name: str):
    def deco(fn):
        _DF_OPERATORS[name] = fn
        return fn

    return deco


#: Blocks the reference gates to sequential per-index processing
#: (``parallel_available: false`` — config/config.yaml:107
#: openai_image_request, :238 join_videos, :249 video_add_audio, :260
#: video_add_subtitles, :291 audio_chunk, :302 audio_convert, :316
#: audio_from_video; :180 fetch_moderation_tg is driver-evaluated and
#: needs no stage gate). On Spark the analog is a bounded-width stage:
#: the runner repartitions the block's input to its slot budget so at most
#: N concurrent tasks hit the rate-limited resource cluster-wide,
#: whatever the upstream fan-out width.
NON_PARALLEL_BLOCKS = frozenset(
    {
        "openai_image_request",
        "join_videos",
        "video_add_audio",
        "video_add_subtitles",
        "audio_chunk",
        "audio_convert",
        "audio_from_video",
    }
)


def _canonical(df: DataFrame) -> DataFrame:
    cols = set(df.columns)
    out = df
    if "output_index" not in cols:
        out = out.withColumn("output_index", F.lit(0).cast("long"))
    if "payload_str" not in cols:
        out = out.withColumn("payload_str", F.lit(None).cast("string"))
    if "payload_bin" not in cols:
        out = out.withColumn("payload_bin", F.lit(None).cast("binary"))
    if "mime" not in cols:
        out = out.withColumn("mime", F.lit(None).cast("string"))
    return out.select(
        F.col("input_index").cast("long"),
        F.col("output_index").cast("long"),
        F.col("payload_str").cast("string"),
        F.col("payload_bin").cast("binary"),
        F.col("mime").cast("string"),
    )


def _cfg_float(cfg: dict, key: str, default: float | None) -> float | None:
    v = cfg.get(key, default)
    return None if v is None else float(v)


@df_operator("image_resize")
def _dfop_image_resize(runner, df, block):
    from ..operators import media

    cfg = block.input
    return media.image_resize(
        df.withColumnRenamed("image", "payload_bin"),
        int(cfg.get("width", 100)),  # config.yaml:136-139
        int(cfg.get("height", 100)),
        bool(cfg.get("keep_aspect_ratio", True)),
    )


@df_operator("image_blur")
def _dfop_image_blur(runner, df, block):
    from ..operators import media

    return media.image_blur(
        df.withColumnRenamed("image", "payload_bin"),
        float(block.input.get("sigma", 1.5)),  # config.yaml:149
    )


@df_operator("image_add_text")
def _dfop_image_add_text(runner, df, block):
    from ..operators import media

    cfg = block.input
    src = df.withColumnRenamed("image", "payload_bin")
    if "text" not in src.columns:
        src = src.withColumn("text", F.lit(str(cfg.get("text", ""))))
    # fallbacks mirror config/config.yaml:119-127 (the normal path seeds
    # them via validation.BLOCK_CONFIG_DEFAULTS before cfg is read)
    return media.image_add_text(
        src,
        "text",
        font_size=int(cfg.get("font_size", 50)),
        text_position=str(cfg.get("text_position", "center-center")),
        # full style surface (block_image_add_text.go:182-189)
        margin=int(cfg.get("text_bg_margin", cfg.get("margin", 10))),
        font_color=cfg.get("font_color", "#000000"),
        bg_color=cfg.get("text_bg_color", "#000000"),
        bg_alpha=float(cfg.get("text_bg_alpha", 0.5)),
        bg_all_width=bool(cfg.get("text_bg_all_width", True)),
    )


@df_operator("video_from_image")
def _dfop_video_from_image(runner, df, block):
    from ..operators import media

    # start/end come per-row when bound (flagship spec binds them from
    # $.segments[*].start/end), else from static block input.
    cfg = block.input
    return media.video_from_image(
        df.withColumnRenamed("image", "payload_bin"),
        float(cfg.get("start", 0.0)),
        float(cfg.get("end", 1.0)),  # config.yaml:228-229
        int(cfg.get("fps", 30)),
        start_col="start" if "start" in df.columns else None,
        end_col="end" if "end" in df.columns else None,
    )


@df_operator("join_videos")
def _dfop_join_videos(runner, df, block):
    from ..operators import media

    return media.join_videos(
        df.withColumnRenamed("videos", "payload_bin"),
        re_encode=bool(block.input.get("re_encode", False)),
    )


@df_operator("video_add_audio")
def _dfop_video_add_audio(runner, df, block):
    from ..operators import media

    out = media.video_add_audio(
        df,
        "video",
        "audio",
        bool(block.input.get("replace_original_audio", False)),
    )
    return out.withColumnRenamed("video", "payload_bin")


@df_operator("video_add_subtitles")
def _dfop_video_add_subtitles(runner, df, block):
    from ..operators import media

    return media.video_add_subtitles(
        df.withColumnRenamed("video", "payload_bin"),
        "subtitles",
        str(block.input.get("embedding_type", "burn")),
    )


@df_operator("audio_from_video")
def _dfop_audio_from_video(runner, df, block):
    from ..operators import media

    cfg = block.input
    return media.audio_from_video(
        df.withColumnRenamed("video", "payload_bin"),
        _cfg_float(cfg, "start", None),
        _cfg_float(cfg, "end", None),
    )


def _parse_go_duration(v, default: float) -> float:
    """Go ``time.ParseDuration`` strings ("10m", "1h30m", "90s", "250ms")
    → seconds (block_audio_chunk.go:94); bare numbers pass through."""
    if v is None:
        return default
    if isinstance(v, (int, float)):
        return float(v)
    import re

    total, matched = 0.0, False
    for m in re.finditer(r"(\d+(?:\.\d+)?)(h|ms|m|s)", str(v).strip()):
        total += float(m.group(1)) * {"h": 3600.0, "m": 60.0, "s": 1.0, "ms": 0.001}[
            m.group(2)
        ]
        matched = True
    if not matched:
        return float(v)
    return total


def _parse_bitrate(v) -> int | None:
    """ffmpeg bitrate strings ("32k", "1M") → bits/s; ints pass through."""
    if v is None:
        return None
    if isinstance(v, (int, float)):
        return int(v)
    s = str(v).strip().lower()
    mult = 1
    if s.endswith("k"):
        mult, s = 1000, s[:-1]
    elif s.endswith("m"):
        mult, s = 1_000_000, s[:-1]
    return int(float(s) * mult)


@df_operator("audio_chunk")
def _dfop_audio_chunk(runner, df, block):
    from ..operators import media

    return media.audio_chunk(
        df.withColumnRenamed("audio", "payload_bin"),
        _parse_go_duration(block.input.get("duration"), 600.0),
    )


@df_operator("audio_convert")
def _dfop_audio_convert(runner, df, block):
    from ..operators import media

    cfg = block.input
    sr = cfg.get("sample_rate")
    # schema field is bit_rate (block_audio_convert.go:153); the shipped
    # podcast JSON writes "bitrate", which the reference's schema silently
    # ignores — accept both here rather than reproduce the typo behavior
    br = cfg.get("bit_rate", cfg.get("bitrate"))
    return media.audio_convert(
        df.withColumnRenamed("audio", "payload_bin"),
        format=str(cfg.get("format", "mp3")),
        mono=bool(cfg.get("mono", False)),
        sample_rate=None if sr is None else int(sr),
        bit_rate=_parse_bitrate(br),
    )


@df_operator("http_request")
def _dfop_http_request(runner, df, block):
    from ..operators import external

    # per-row request shaping (block_http.go:69-91): method/headers/query/
    # body bind from upstream columns when present, static values from the
    # block input otherwise
    out = external.http_request(
        df,
        url_col="url",
        method_col="method" if "method" in df.columns else None,
        headers=block.input.get("headers"),
        headers_col="headers" if "headers" in df.columns else None,
        query_col="query" if "query" in df.columns else None,
        body_col="body" if "body" in df.columns else None,
        policy=runner.http_policy,
        on_error=str(block.input.get("on_error", "fail")),
    )
    # textual bodies surface as payload_str too, so downstream json_path /
    # string bindings work (HandleResultValue semantics, block.go:502-519)
    textual = F.col("mime").rlike("^(text/|application/(json|xml))")
    return out.withColumn(
        "payload_str", F.when(textual, F.col("payload_bin").cast("string"))
    )


@df_operator("openai_chat_completion")
def _dfop_chat(runner, df, block):
    from ..operators import external

    cfg = block.input
    out = external.openai_chat_completion(
        df,
        runner.require_openai(),
        user_prompt_col="user_prompt",
        system_prompt_col="system_prompt" if "system_prompt" in df.columns else None,
        model=str(cfg.get("model", "gpt-4o-mini")),
        response_format=str(cfg.get("response_format", "text")),
    )
    return out.withColumnRenamed("completion", "payload_str")


@df_operator("openai_tts_request")
def _dfop_tts(runner, df, block):
    from ..operators import external

    cfg = block.input
    return external.openai_tts_request(
        df,
        runner.require_openai(),
        text_col="text",
        model=str(cfg.get("model", "tts-1")),
        voice=str(cfg.get("voice", "alloy")),
        response_format=str(cfg.get("response_format", "mp3")),
        speed=float(cfg.get("speed", 1.0)),
    )


@df_operator("openai_transcription_request")
def _dfop_transcription(runner, df, block):
    from ..operators import external

    cfg = block.input
    out = external.openai_transcription_request(
        df,
        runner.require_openai(),
        audio_col="audio",
        model=str(cfg.get("model", "whisper-1")),
        language=str(cfg.get("language", "en")),
        response_format=str(cfg.get("format", "verbose_json")),
    )
    return out.withColumnRenamed("transcription", "payload_str")


@df_operator("openai_image_request")
def _dfop_image_request(runner, df, block):
    from ..operators import external

    cfg = block.input
    # stage width already bounded by the runner's NON_PARALLEL_BLOCKS gate
    return external.openai_image_request(
        df,
        runner.require_openai(),
        prompt_col="prompt",
        quality=str(cfg.get("quality", "standard")),
        size=str(cfg.get("size", "1024x1024")),
        model=str(cfg.get("model", "dall-e-3")),
    )


_MODERATION_FETCH = "fetch_moderation_tg"  # runner-evaluated control block


@dataclass
class Decision:
    input_index: int
    action: str
    event_time: Any
    event_id: int
    regenerate_block_slug: str | None = None


class ModerationPending(Exception):
    """No (post-cursor) decision for an index — the reference's 50×10 s
    retry-if-unknown budget exhausting (config.yaml:184-186)."""

    def __init__(self, block_slug: str, indices: list[int]):
        self.block_slug = block_slug
        self.indices = indices
        super().__init__(f"moderation pending at {block_slug} for indices {indices}")


@dataclass
class _Regenerate:
    goto_slug: str
    goto_index: int


class StopPipeline(Exception):
    """Raised (driver-side) when a stop_pipeline condition fires
    (pipeline.go:439-513)."""

    def __init__(self, block_slug: str, index: int | None = None):
        self.block_slug = block_slug
        self.index = index
        super().__init__(f"pipeline stopped at {block_slug}")


@dataclass
class RunResult:
    processing_id: str
    statuses: dict[str, str]  # block_slug -> 'completed' | 'stopped' | 'skipped'
    stopped_at: str | None
    output: DataFrame | None  # last completed block's stage


# --- runner -----------------------------------------------------------------


class PipelineRunner:
    """Executes a PipelineSpec block-by-block with per-stage materialization.

    Mirrors PipelineData.Process (pipeline.go:146-641): resume loads prior
    stage outputs (:195-201), target_index skips other fan-out indices
    (:358-377), stop conditions halt the run (:439-513).
    """

    def __init__(
        self,
        spark: SparkSession,
        store_root: str,
        openai_client=None,
        http_policy=None,
        non_parallel_slots: int = 1,
    ):
        from ..operators.external import RetryPolicy

        self.spark = spark
        self.store_root = store_root
        self.openai_client = openai_client
        self.http_policy = http_policy or RetryPolicy()
        #: stage width for NON_PARALLEL_BLOCKS — 1 mirrors the reference's
        #: sequential per-index processing (pipeline.go:607-624 with
        #: parallel_available:false); raise when the gated resource allows
        #: some concurrency. A per-block ``max_concurrency`` input overrides.
        self.non_parallel_slots = max(1, int(non_parallel_slots))
        #: per-run cache: origin slug → payload-is-binary (reset per run())
        self._binary_stages: dict[str, bool] = {}

    def require_openai(self):
        if self.openai_client is None:
            raise RuntimeError(
                "pipeline uses an OpenAI block; pass openai_client= to "
                "PipelineRunner (tests: point it at a mock server)"
            )
        return self.openai_client

    # -- input assembly (GetInputConfigData, block.go:193-401) --------------

    def _stage_is_binary(self, slug: str, src: DataFrame) -> bool:
        """Whether a stage's payload is binary (file-typed in the reference).

        The reference binds by the *stored output's* type — a TTS/image stage
        hands bytes downstream without the spec saying ``format:"file"``
        (GetInputConfigData, block.go:193-254). Stage parquet always carries
        both payload columns, so the kind is decided from the data: one
        pruned ``take(1)`` on payload_bin per (run, origin) — control-plane
        cost, cached for the rest of the run.
        """
        if slug not in self._binary_stages:
            self._binary_stages[slug] = bool(
                src.where(F.col("payload_bin").isNotNull()).take(1)
            )
        return self._binary_stages[slug]

    def _bind_origin(
        self, stages: dict[str, DataFrame], b: InputBinding, fan_out: bool
    ) -> DataFrame:
        """One binding → DataFrame(input_index, <param>)."""
        src = stages[b.origin]
        # "$" / absent path = the whole payload (oliveagle jsonpath identity)
        path = b.json_path if b.json_path not in (None, "$") else None
        if b.binary or (path is None and self._stage_is_binary(b.origin, src)):
            # raw payload bytes: explicit format:"file" (json_schema.go:69-78)
            # or a binary-producing origin (tts/image/video stages). For
            # array_input over binary stages the rows bind as-is — the
            # consuming operator (join_videos) does the ordered gather
            # itself, so collecting an array<binary> here would only force
            # a second pass over the payload bytes.
            return src.select(F.col("input_index"), F.col("payload_bin").alias(b.param))
        if b.array_input:
            # gather: ALL origin outputs as one array value, output order
            # (block.go:274-276,306-336). A scalar json_path applies per
            # output BEFORE the gather (podcast-summary.json gathers
            # "$.text" of every chunk transcription — block.go:306-336
            # routes each buffer through the same JSONPath lookup).
            v = (
                json_path_scalar(F.col("payload_str"), path)
                if path
                else F.col("payload_str")
            )
            pair = F.struct(
                F.col("input_index").alias("i"),
                F.col("output_index").alias("o"),
                v.alias("v"),
            )
            arr = F.transform(F.sort_array(F.collect_list(pair)), lambda s: s["v"])
            return src.agg(arr.alias(b.param)).select(
                F.lit(0).cast("long").alias("input_index"), b.param
            )
        if b.json_path and "[*]" in b.json_path:
            arr = json_path_array(F.col("payload_str"), b.json_path)
            if fan_out:
                # wildcard fan-out: indices run over the concatenation of
                # every origin buffer's matches (block.go:245-254,348-359).
                # The running index is offset(src buffer) + position-within-
                # buffer: the only unpartitioned window runs over the
                # one-row-per-buffer size table (control-plane cardinality),
                # never over the fan-out rows themselves — no single-task
                # funnel however wide the fan-out gets.
                sizes = src.select(
                    F.col("input_index").alias("src_idx"),
                    F.greatest(F.size(arr), F.lit(0)).alias("__n"),
                )
                w = W.orderBy("src_idx").rowsBetween(W.unboundedPreceding, -1)
                offsets = sizes.select(
                    "src_idx",
                    F.coalesce(F.sum("__n").over(w), F.lit(0)).alias("__off"),
                )
                exploded = src.select(
                    F.col("input_index").alias("src_idx"),
                    F.posexplode(arr).alias("pos", b.param),
                )
                return exploded.join(F.broadcast(offsets), "src_idx").select(
                    (F.col("__off") + F.col("pos")).cast("long").alias("input_index"),
                    b.param,
                )
            return src.select(F.col("input_index"), arr.alias(b.param))
        if path:
            val = json_path_scalar(F.col("payload_str"), path)
        else:
            val = F.col("payload_str")
        return src.select(F.col("input_index"), val.alias(b.param))

    def _build_inputs(
        self,
        block: BlockSpec,
        stages: dict[str, DataFrame],
        request_input: dict[str, Any],
    ) -> tuple[DataFrame, dict[str, Column]]:
        """Assemble the block's input rows + bound parameter columns.

        Priority per parameter: request input > binding-derived > static
        block input (GetInputDataByPriority, pipeline.go:281-305).
        """
        df: DataFrame | None = None
        bound_params: set[str] = set()
        for b in block.bindings:
            part = self._bind_origin(stages, b, block.fan_out)
            bound_params.add(b.param)
            if df is None:
                df = part
            else:
                # positional merge of origins (MergeMaps, block.go:404-500):
                # full-outer on index, missing values inherited from the
                # previous row (scalar-vs-array broadcast fill). The
                # fill-forward window is unpartitioned by design: inherit-
                # from-previous-row is a sequential recurrence over the
                # run's input indices, whose cardinality is the block's
                # fan-out width (segments of one media file, buffers of one
                # processing) — control-plane scale, bounded in practice by
                # the reference's own per-processing buffer counts, not by
                # table scale. Table-scale fan-out never routes through
                # MergeMaps (it has a single origin, no merge).
                keys = ["input_index"]
                joined = df.join(part, keys, "full_outer")
                value_cols = [c for c in joined.columns if c not in keys]
                w = (
                    W.orderBy("input_index")
                    .rowsBetween(W.unboundedPreceding, 0)
                )
                df = joined.select(
                    *keys,
                    *[
                        F.last(F.col(c), ignorenulls=True).over(w).alias(c)
                        for c in value_cols
                    ],
                )
        req = request_input.get(block.slug, {})
        if df is None:
            # no bindings: request fan-out (multipart "field[]" arrays,
            # api/schemas/pipelines.go:117-122) or a single index-0 row
            list_params = {
                k: v for k, v in {**block.input, **req}.items() if isinstance(v, list)
            }
            if block.fan_out and list_params:
                k0, v0 = next(iter(list_params.items()))
                if v0 and isinstance(v0[0], (bytes, bytearray)):
                    # multipart file[] uploads arrive as raw bytes
                    # (api/schemas/pipelines.go:117-151)
                    df = local_df(
                        self.spark,
                        [(i, bytes(x)) for i, x in enumerate(v0)],
                        f"input_index long, {k0} binary",
                    )
                else:
                    df = local_df(
                        self.spark,
                        [(i, str(x)) for i, x in enumerate(v0)],
                        f"input_index long, {k0} string",
                    )
                bound_params = bound_params | {k0}
                req = {k: v for k, v in req.items() if k != k0}
            else:
                # single raw-bytes request value (one multipart file without
                # fan-out, e.g. podcast-summary's upload): bind it as a
                # binary COLUMN so the binary-ingest path sees its type —
                # an F.lit param would coerce to string downstream
                bin_params = {
                    k: v for k, v in req.items() if isinstance(v, (bytes, bytearray))
                }
                if bin_params:
                    k0, v0 = next(iter(bin_params.items()))
                    df = local_df(
                        self.spark,
                        [(0, bytes(v0))],
                        f"input_index long, {k0} binary",
                    )
                    bound_params = bound_params | {k0}
                    req = {k: v for k, v in req.items() if k != k0}
                else:
                    df = self.spark.range(1).select(
                        F.lit(0).cast("long").alias("input_index")
                    )

        params: dict[str, Column] = {p: F.col(p) for p in bound_params}
        for k in set(block.input) | set(req):
            if k in ("template", "separator", "condition", "value"):
                # plan-time literals consumed by the operator builder /
                # stop-condition kernel, not data columns
                continue
            # priority coalesce: request > binding-derived > static default.
            # Dict-valued statics (e.g. extra_decisions, Telegram keyboard
            # config) are block *configuration*, not column data — they stay
            # in __block_input only.
            parts: list[Column] = []
            if k in req and not isinstance(req[k], dict):
                parts.append(F.lit(req[k]))
            if k in params:
                parts.append(params[k])
            if k in block.input and not isinstance(block.input[k], dict):
                parts.append(F.lit(block.input[k]))
            if not parts:
                continue
            params[k] = parts[0] if len(parts) == 1 else F.coalesce(*parts)
        merged_static = {**block.input, **req}
        if "template" in merged_static:
            params["__template_literal"] = merged_static["template"]
        if "separator" in merged_static:
            params["__separator_literal"] = merged_static["separator"]
        params["__block_input"] = merged_static
        return df, params

    # -- execution -----------------------------------------------------------

    def run(
        self,
        spec: PipelineSpec,
        request_input: dict[str, dict[str, Any]] | None = None,
        processing_id: str | None = None,
        start_slug: str | None = None,
        target_index: int | None = None,
        decisions: DataFrame | None = None,
        max_regenerates: int = 50,
    ) -> RunResult:
        """Execute with the reference's outer control loop: a regenerate
        decision re-enters Process at (goto_slug, goto_index) with the same
        processing_id (pipeline.go:447-505); the decision cursor advances
        past consumed events (GetUpdates offset semantics,
        block_fetch_moderation_telegram.go:129-133,218-219)."""
        request_input = request_input or {}
        self._binary_stages = {}
        resuming = processing_id is not None and start_slug is not None
        processing_id = processing_id or uuid.uuid4().hex[:12]
        statuses: dict[str, str] = {}
        cursors: dict[str, tuple] = {}
        cur_start, cur_target = start_slug, target_index
        final_stop: str | None = None
        try:
            for _ in range(max_regenerates + 1):
                res = self._run_pass(
                    spec,
                    request_input,
                    processing_id,
                    cur_start,
                    cur_target,
                    resuming,
                    decisions,
                    cursors,
                    statuses,
                )
                if isinstance(res, _Regenerate):
                    cur_start, cur_target = res.goto_slug, res.goto_index
                    resuming = True
                    continue
                final_stop = res.stopped_at
                return res
            raise RuntimeError(
                f"regenerate budget exhausted ({max_regenerates}, cf. retry_count "
                "config.yaml:184-186)"
            )
        finally:
            # defer-SavePipelineLog parity (pipeline.go:207-214): the status
            # snapshot persists however the run ends
            from ..sources import run_log

            run_log.write_status(
                self.spark,
                self.store_root,
                spec.slug,
                processing_id,
                statuses,
                [b.slug for b in spec.blocks],
                stopped_at=final_stop,
            )

    def _collect_decisions(
        self,
        decisions: DataFrame | None,
        block_slug: str,
        cursor: tuple | None,
    ) -> list[Decision]:
        """Post-cursor decision events in arrival order (driver-side: the
        decision table is human-scale control data, not payload data)."""
        if decisions is None:
            return []
        cols = decisions.columns
        rows = decisions.where(F.col("block_slug") == block_slug).collect()
        out: list[Decision] = []
        for r in rows:
            key = (r["event_time"], r["event_id"])
            if cursor is not None and key <= cursor:
                continue  # consumed by a previous poll (offset advanced)
            action = str(r["action"]).lower()
            action = SHORT_FORMS.get(action, action)
            if action not in ACTIONS:
                action = "unknown"
            out.append(
                Decision(
                    input_index=int(r["input_index"]),
                    action=action,
                    event_time=r["event_time"],
                    event_id=int(r["event_id"]),
                    regenerate_block_slug=(
                        r["regenerate_block_slug"]
                        if "regenerate_block_slug" in cols
                        else None
                    ),
                )
            )
        out.sort(key=lambda d: (d.event_time, d.event_id))
        return out

    def _eval_moderation(
        self,
        block: BlockSpec,
        df: DataFrame,
        spec: PipelineSpec,
        processing_id: str,
        decisions: DataFrame | None,
        cursors: dict[str, tuple],
        statuses: dict[str, str],
    ):
        """fetch_moderation_tg (block_fetch_moderation_telegram.go:99-245):
        decline ⇒ stop (:237-240), regenerate ⇒ goto block+index (:241-245),
        approve ⇒ emit {processing_id, action} JSON per index."""
        indices = sorted(
            r["input_index"] for r in df.select("input_index").distinct().collect()
        )
        events = self._collect_decisions(decisions, block.slug, cursors.get(block.slug))
        # Poll-loop replay: consume events in arrival order and act at the
        # first moment every index has a decision (the reference's per-index
        # pollers all return) — later events stay unconsumed for the next
        # pass. Last-decision-wins *within* the consumed window (:218-219).
        decs: dict[int, Decision] = {}
        consumed = cursors.get(block.slug)
        covered = False
        for d in events:
            if d.action != "unknown":
                decs[d.input_index] = d
            consumed = (d.event_time, d.event_id)
            if all(i in decs for i in indices):
                covered = True
                break
        if not covered:
            missing = [i for i in indices if i not in decs]
            statuses[block.slug] = "waiting_moderation"
            raise ModerationPending(block.slug, missing)
        cursors[block.slug] = consumed  # offset advance: events are acked
        declined = [i for i in indices if decs[i].action == "decline"]
        regen = [i for i in indices if decs[i].action == "regenerate"]
        out = local_df(
            self.spark,
            [
                (
                    int(i),
                    0,
                    f'{{"processing_id": "{processing_id}", "action": "{decs[i].action}"}}',
                )
                for i in indices
            ],
            "input_index long, output_index long, payload_str string",
        )
        out = _canonical(out)
        self._write(out, spec, processing_id, block.slug)
        if declined:
            statuses[block.slug] = "stopped"
            return "stopped", out
        if regen:
            idx = regen[0]
            goto_slug = decs[idx].regenerate_block_slug or str(
                block.input.get("regenerate_block_slug", "")
            )
            slugs = [b.slug for b in spec.blocks]
            if goto_slug not in slugs or slugs.index(goto_slug) > slugs.index(
                block.slug
            ):
                raise ValueError(
                    f"regenerate target {goto_slug!r} must be an upstream block"
                )
            statuses[block.slug] = "regenerating"
            return "regenerate", _Regenerate(goto_slug, int(idx))
        statuses[block.slug] = "completed"
        return "completed", out

    def _run_pass(
        self,
        spec: PipelineSpec,
        request_input: dict[str, dict[str, Any]],
        processing_id: str,
        start_slug: str | None,
        target_index: int | None,
        resuming: bool,
        decisions: DataFrame | None,
        cursors: dict[str, tuple],
        statuses: dict[str, str],
    ) -> "RunResult | _Regenerate":
        stages: dict[str, DataFrame] = {}

        start_pos = 0
        if start_slug is not None:
            slugs = [b.slug for b in spec.blocks]
            start_pos = slugs.index(start_slug)
        # resume: rehydrate prior stages lazily from the store
        # (pipeline.go:195-201 → LoadOutput)
        if resuming:
            for b in spec.blocks[:start_pos]:
                stages[b.slug] = stage_store.read_stage(
                    self.spark, self.store_root, spec.slug, processing_id, b.slug
                )
                statuses[b.slug] = "loaded"

        stopped_at: str | None = None
        last_df: DataFrame | None = None
        for pos, block in enumerate(spec.blocks):
            if pos < start_pos:
                continue
            df, params = self._build_inputs(block, stages, request_input)
            if target_index is not None and pos == start_pos and start_slug is not None:
                # target-index recompute: only that fan-out index
                # (pipeline.go:358-377); other indices come from the stored
                # stage and are merged back below.
                df = df.where(F.col("input_index") == target_index)

            if block.id == _MODERATION_FETCH:
                kind, res = self._eval_moderation(
                    block, df, spec, processing_id, decisions, cursors, statuses
                )
                if kind == "regenerate":
                    return res
                stages[block.slug] = res
                last_df = res
                if kind == "stopped":
                    stopped_at = block.slug
                    break
                continue

            if block.id in _DF_OPERATORS:
                # Arrow-batched media/external stage: materialize bound
                # params as columns, then hand the frame to the operator.
                work = df
                for k, c in params.items():
                    if k.startswith("__") or k in work.columns:
                        continue
                    work = work.withColumn(k, c)
                if block.id in NON_PARALLEL_BLOCKS:
                    # parallel_available:false → bounded-width stage: an
                    # explicit numbered repartition AQE will not re-widen,
                    # capping cluster-wide concurrency at the slot budget.
                    slots = int(
                        block.input.get("max_concurrency", self.non_parallel_slots)
                    )
                    work = work.repartition(max(1, slots))
                out = _canonical(_DF_OPERATORS[block.id](self, work, block))
                out = self._finish_stage(
                    out, spec, processing_id, block, pos, start_pos, start_slug, target_index
                )
                stages[block.slug] = out
                statuses[block.slug] = "completed"
                last_df = out
                continue

            op = _OPERATORS[block.id]
            params["__dtypes"] = dict(df.dtypes)  # array-aware rendering
            value = op(params)

            if block.id == "upload_file" and dict(df.dtypes).get("file") == "binary":
                # raw media ingest: payload stays binary, mime sniffed from
                # magic bytes (types/helpers/storage.go:10-26)
                out = _canonical(
                    df.select(
                        "input_index",
                        value.alias("payload_bin"),
                        stage_store.sniff_mime(value).alias("mime"),
                    )
                )
                out = self._finish_stage(
                    out, spec, processing_id, block, pos, start_pos, start_slug, target_index
                )
                stages[block.slug] = out
                statuses[block.slug] = "completed"
                last_df = out
                continue

            if block.id in _STOPS:
                # condition kernel (helpers/condition.go:18-35): numeric
                # comparison when the comparand is numeric, else string.
                cond_op = str(block.input.get("condition", "=="))
                cmp_value = block.input.get("value")
                data = params["data"]
                if isinstance(cmp_value, (int, float)):
                    flag = stop_condition(data.cast("double"), cond_op, float(cmp_value))
                else:
                    flag = stop_condition(data.cast("string"), cond_op, str(cmp_value))
                out = df.select(
                    "input_index",
                    F.lit(0).cast("long").alias("output_index"),
                    data.cast("string").alias("payload_str"),
                    flag.alias("__stop"),
                )
                hits = out.where(F.col("__stop")).select("input_index").take(1)
                out = _canonical(out.drop("__stop"))
                self._write(out, spec, processing_id, block.slug)
                stages[block.slug] = out
                if hits:
                    statuses[block.slug] = "stopped"
                    stopped_at = block.slug
                    last_df = out
                    break
                statuses[block.slug] = "completed"
                last_df = out
                continue

            if block.id in _EXPLODES:
                out = df.select(
                    "input_index", F.posexplode(value).alias("output_index", "payload_str")
                ).select(
                    "input_index",
                    F.col("output_index").cast("long"),
                    F.col("payload_str").cast("string"),
                )
            else:
                out = df.select(
                    "input_index",
                    F.lit(0).cast("long").alias("output_index"),
                    value.cast("string").alias("payload_str"),
                )

            out = self._finish_stage(
                _canonical(out), spec, processing_id, block, pos, start_pos, start_slug, target_index
            )
            stages[block.slug] = out
            statuses[block.slug] = "completed"
            last_df = out

        for b in spec.blocks:
            statuses.setdefault(b.slug, "skipped")
        return RunResult(
            processing_id=processing_id,
            statuses=statuses,
            stopped_at=stopped_at,
            output=last_df,
        )

    def _finish_stage(
        self,
        out: DataFrame,
        spec: PipelineSpec,
        processing_id: str,
        block: BlockSpec,
        pos: int,
        start_pos: int,
        start_slug: str | None,
        target_index: int | None,
    ) -> DataFrame:
        """Target-index merge + stage materialization + rehydrated read."""
        if target_index is not None and pos == start_pos and start_slug is not None:
            # merge recomputed index with previously stored outputs;
            # eager checkpoint breaks lineage before overwriting the
            # very files the merge reads (read-overwrite hazard)
            prior = stage_store.read_stage(
                self.spark, self.store_root, spec.slug, processing_id, block.slug
            ).where(F.col("input_index") != target_index)
            out = prior.select(out.columns).unionByName(out).localCheckpoint(eager=True)
        self._write(out, spec, processing_id, block.slug)
        return stage_store.read_stage(
            self.spark, self.store_root, spec.slug, processing_id, block.slug
        )

    def _write(self, df: DataFrame, spec: PipelineSpec, processing_id: str, slug: str):
        stage_store.write_stage(
            _canonical(df),
            self.store_root,
            spec.slug,
            processing_id,
            slug,
        )
