"""Submit-time pipeline-spec validation + block-input schemas.

The reference validates every pipeline document at load against
``config/pipelines_validation_schema.json``
(types/registries/pipeline_registry.go:63-84) and every block's input
against the block's own JSON schema before Process
(types/blocks/block.go:163-183). Without this, a malformed spec fails
deep inside a Spark plan (an unresolved column three blocks downstream)
instead of at submit — the difference between a 2-second error and a
20-minute one on a real cluster.

``PIPELINE_DOC_SCHEMA`` mirrors the reference schema's semantics
(slug pattern, title/description minimum lengths, blocks minItems,
per-block id/slug/description + input_config.property origins).
``BLOCK_INPUT_SCHEMAS`` mirrors the per-block ``SchemaString`` constraints
for the scalar blocks (e.g. block_wrap_text.go:105-133 required text,
block_join_strings.go:108-131 minItems 1 + separator default,
block_openai_tts_request.go:115-143 voice/model enums).

Spark translation note: the reference validates *runtime data* per index;
bound column data lives on executors, so the Spark-idiomatic split is —
statically-known values (block input, request input) validate driver-side
at submit; bound parameters are checked for *presence* against the
schema's ``required`` list (the union of static and bound names must
cover it); per-row value constraints stay with the operators.
"""

from __future__ import annotations

from typing import Any

import jsonschema

#: Mirror of config/pipelines_validation_schema.json (draft-07 semantics).
PIPELINE_DOC_SCHEMA: dict[str, Any] = {
    "$schema": "https://json-schema.org/draft-07/schema",
    "type": "object",
    "additionalProperties": False,
    "required": ["slug", "title", "description", "blocks"],
    "properties": {
        "slug": {"type": "string", "pattern": r"^[-\w]+$"},
        "title": {"type": "string", "minLength": 10},
        "description": {"type": "string", "minLength": 20},
        "blocks": {
            "type": "array",
            "minItems": 1,
            "items": {
                "type": "object",
                "required": ["id", "slug", "description"],
                "properties": {
                    "id": {"type": "string", "pattern": r"^[-\w]+$"},
                    "slug": {"type": "string", "pattern": r"^[-\w]+$"},
                    "description": {"type": "string", "minLength": 20},
                    "input": {"type": "object"},
                    "input_config": {
                        "type": "object",
                        "required": ["property"],
                        "properties": {
                            "type": {
                                "type": "string",
                                "enum": ["array", "number", "string", "boolean"],
                            },
                            "parallel": {"type": "boolean"},
                            "property": {
                                "type": "object",
                                "patternProperties": {
                                    "^.*$": {
                                        "type": "object",
                                        "required": ["origin"],
                                        "properties": {
                                            "origin": {"type": "string"},
                                            "json_path": {"type": "string"},
                                        },
                                    }
                                },
                            },
                        },
                    },
                    "output_config": {
                        "type": "object",
                        "required": ["type"],
                        "properties": {
                            "type": {
                                "type": "string",
                                "enum": ["array", "number", "string", "boolean"],
                            },
                            "share_output": {"type": "boolean"},
                        },
                    },
                },
                "anyOf": [
                    {"required": ["input_config"]},
                    {"required": ["input"]},
                ],
            },
        },
    },
}

#: Per-block static-input constraints, mirroring the reference blocks'
#: SchemaString `input` sections (file:line cited per entry).
BLOCK_INPUT_SCHEMAS: dict[str, dict[str, Any]] = {
    # block_wrap_text.go:105-133
    "wrap_text": {
        "type": "object",
        "properties": {
            "text": {"type": "string", "minLength": 1},
            "prefix": {"type": "string"},
            "suffix": {"type": "string"},
        },
        "required": ["text"],
    },
    # block_text_replace.go:110-140
    "text_replace": {
        "type": "object",
        "properties": {
            "text": {"type": "string", "minLength": 1},
            "old": {"type": "string", "minLength": 1},
            "new": {"type": "string", "minLength": 1},
            "prefix": {"type": "string"},
            "suffix": {"type": "string"},
        },
        "required": ["text", "old", "new"],
    },
    # block_join_strings.go:108-131
    "join_strings": {
        "type": "object",
        "properties": {
            "strings": {
                "type": "array",
                "items": {"type": "string"},
                "minItems": 1,
            },
            "separator": {"type": "string", "default": ""},
        },
        "required": ["strings"],
    },
    # block_format_string_from_object.go (template + free-form variables)
    "format_string_from_object": {
        "type": "object",
        "properties": {"template": {"type": "string", "minLength": 1}},
        "required": ["template"],
    },
    # block_stop_pipeline.go:92-120 + helpers/condition.go:18-35
    "stop_pipeline": {
        "type": "object",
        "properties": {
            "data": {"type": "string"},
            "condition": {
                "type": "string",
                "enum": ["==", "!=", ">", "<", ">=", "<="],
            },
            "value": {"type": ["string", "number"]},
        },
        "required": ["data", "condition", "value"],
    },
    # block_openai_tts_request.go:115-143
    "openai_tts_request": {
        "type": "object",
        "properties": {
            "model": {"type": "string", "default": "tts-1", "enum": ["tts-1"]},
            "text": {"type": "string", "minLength": 10},
            "voice": {
                "type": "string",
                "default": "alloy",
                "enum": ["alloy", "echo", "fable", "onyx", "nova", "shimmer"],
            },
            "response_format": {"type": "string", "default": "mp3", "enum": ["mp3"]},
            "speed": {"type": "number", "default": 1.0},
        },
        "required": ["text"],
    },
    # block_image_resize.go:125-150
    "image_resize": {
        "type": "object",
        "properties": {
            "width": {"type": "integer", "default": 100},
            "height": {"type": "integer", "default": 100},
            "keep_aspect_ratio": {"type": "boolean", "default": True},
        },
        "required": [],
    },
    # block_http.go:69-110 (url required; method enum)
    "http_request": {
        "type": "object",
        "properties": {
            "url": {"type": "string", "minLength": 1},
            "method": {
                "type": "string",
                "default": "GET",
                "enum": ["GET", "POST", "PUT", "PATCH", "DELETE", "HEAD"],
            },
            "headers": {"type": "object"},
            "query": {"type": "object"},
            "body": {"type": ["string", "object"]},
        },
        "required": ["url"],
    },
}


class SpecValidationError(ValueError):
    """Pipeline document rejected at submit time (one message per error)."""

    def __init__(self, slug: str, errors: list[str]):
        self.slug = slug
        self.errors = errors
        msgs = "\n- ".join(errors)
        super().__init__(f"pipeline spec {slug!r} invalid:\n- {msgs}")


def _schema_errors(doc: Any, schema: dict, prefix: str = "") -> list[str]:
    validator = jsonschema.Draft7Validator(schema)
    out = []
    for e in sorted(validator.iter_errors(doc), key=lambda e: list(e.absolute_path)):
        where = "/".join(str(p) for p in e.absolute_path) or "<root>"
        out.append(f"{prefix}{where}: {e.message}")
    return out


def validate_pipeline_doc(doc: dict, known_block_ids: set[str]) -> None:
    """Submit-time validation: document shape (reference schema parity),
    known block ids, origin wiring (origins must name an *upstream* block —
    blocks execute in declaration order, pipeline.go:204-241), and
    statically-checkable input constraints per block.

    Raises :class:`SpecValidationError` with every problem at once, not
    just the first.
    """
    errors = _schema_errors(doc, PIPELINE_DOC_SCHEMA)
    slug = doc.get("slug", "<unknown>") if isinstance(doc, dict) else "<unknown>"
    blocks = doc.get("blocks") if isinstance(doc, dict) else None
    if isinstance(blocks, list):
        seen: list[str] = []
        for i, b in enumerate(blocks):
            if not isinstance(b, dict):
                continue
            bid, bslug = b.get("id"), b.get("slug", f"<block {i}>")
            if bid is not None and bid not in known_block_ids:
                errors.append(f"blocks/{i}: unknown block id {bid!r}")
            props = ((b.get("input_config") or {}).get("property")) or {}
            for param, spec in props.items():
                origin = spec.get("origin") if isinstance(spec, dict) else None
                if origin is not None and origin not in seen:
                    errors.append(
                        f"blocks/{i}/{bslug}: binding {param!r} references "
                        f"{origin!r}, which is not an upstream block slug"
                    )
            static = b.get("input") or {}
            schema = BLOCK_INPUT_SCHEMAS.get(bid or "")
            if schema and isinstance(static, dict):
                # statics validate fully; bound/request params only need to
                # exist, so `required` is checked against static ∪ bound names
                bound = set(props)
                partial = {
                    k: v for k, v in schema.items() if k != "required"
                }
                errors.extend(
                    _schema_errors(static, partial, prefix=f"blocks/{i}/{bslug}: ")
                )
                missing = [
                    r
                    for r in schema.get("required", [])
                    if r not in static and r not in bound
                ]
                if missing:
                    errors.append(
                        f"blocks/{i}/{bslug}: required input(s) {missing} neither "
                        "statically set nor bound via input_config"
                    )
            if bslug is not None:
                seen.append(bslug)
    if errors:
        raise SpecValidationError(slug, errors)


# Per-block operator defaults mirroring config/config.yaml `blocks:` (the
# reference's defaultBlockConfig layer, merged under the pipeline JSON by
# MergeStructs — block.go GetBlockConfig). Only behavior-bearing keys are
# kept; ffmpeg_binary/detector/reliability are deployment concerns the
# Spark engine handles elsewhere (media backend gate, Spark retries).
BLOCK_CONFIG_DEFAULTS: dict[str, dict[str, Any]] = {
    # config.yaml:68-74
    "openai_chat_completion": {
        "model": "gpt-4o-2024-08-06",
        "system_prompt": "You are a helpful assistant.",
    },
    # config.yaml:78-89
    "openai_tts_request": {
        "model": "tts-1",
        "voice": "alloy",
        "response_format": "mp3",
        "speed": 1.0,
    },
    # config.yaml:91-100
    "openai_transcription_request": {
        "model": "whisper-1",
        "language": "en",
        "format": "verbose_json",
    },
    # config.yaml:102-110
    "openai_image_request": {"quality": "standard", "size": "1024x1024"},
    # config.yaml:112-127 — the ADVICE r2 item: font_size 50 (not 12),
    # black half-alpha full-width bg rect by default
    "image_add_text": {
        "font_size": 50,
        "font_color": "#000000",
        "text_position": "center-center",
        "text_bg_color": "#000000",
        "text_bg_all_width": True,
        "text_bg_alpha": 0.5,
        "text_bg_margin": 10,
    },
    # config.yaml:129-139
    "image_resize": {"width": 100, "height": 100, "keep_aspect_ratio": True},
    # config.yaml:141-149
    "image_blur": {"sigma": 1.5},
    # config.yaml:151-159
    "stop_pipeline": {"stop": False},
    # config.yaml:161-172
    "send_moderation_tg": {
        "approve": "Approve",
        "decline": "Decline",
        "regenerate": "Regenerate",
        "group_id": "0",
    },
    # config.yaml:174-186
    "fetch_moderation_tg": {
        "block_slug": "",
        "stop_pipeline_if_decline": True,
        "retry_if_unknown": True,
        "retry_count": 50,
        "retry_interval": "10s",
    },
    # config.yaml:197-204
    "join_strings": {"separator": ""},
    # config.yaml:215-229
    "video_from_image": {
        "format": "mp4",
        "preset": "veryfast",
        "crf": 23,
        "fps": 30,
        "start": 0.0,
        "end": 1.0,
    },
    # config.yaml:231-239
    "join_videos": {"re_encode": False},
    # config.yaml:241-249
    "video_add_audio": {"replace_original_audio": False},
    # config.yaml:251-259
    "video_add_subtitles": {"embedding_type": "mux"},
    # config.yaml:261-269
    "send_message_tg": {"group_id": "0"},
    # config.yaml:271-279
    "format_string_from_object": {"template": ""},
    # config.yaml:281-289
    "audio_chunk": {"duration": "10m"},
    # config.yaml:291-300
    "audio_convert": {
        "format": "mp3",
        "mono": False,
        "sample_rate": 44100,
        "bit_rate": "64k",
    },
    # config.yaml:302-310
    "audio_from_video": {"start": -1, "end": -1, "format": "mp3"},
    # config.yaml:323-347
    "subtitles_from_transcription": {
        "input_format": "openai_verbose_json",
        "output_format": "ass",
        "name": "Default",
        "font_name": "Arial",
        "font_size": 30,
        "primary_colour": "&H00FFFFFF",
        "secondary_colour": "&H00000000",
        "back_colour": "&H00000000",
        "bold": -1,
        "italic": 0,
        "border_style": 1,
        "outline": 1.0,
        "shadow": 0.0,
        "alignment": 2,
        "margin_l": 10,
        "margin_r": 10,
        "margin_v": 10,
    },
}


def apply_input_defaults(block_id: str, static: dict[str, Any]) -> dict[str, Any]:
    """Defaults merged under the user's static input, two layers like the
    reference: block JSON-schema defaults, then config.yaml per-block
    config (``BLOCK_CONFIG_DEFAULTS`` — MergeStructs order, e.g.
    block_wrap_text.go:60-63), then the pipeline document's own input."""
    schema = BLOCK_INPUT_SCHEMAS.get(block_id)
    out: dict[str, Any] = (
        {
            k: p["default"]
            for k, p in schema.get("properties", {}).items()
            if "default" in p
        }
        if schema
        else {}
    )
    out.update(BLOCK_CONFIG_DEFAULTS.get(block_id, {}))
    out.update(static)
    return out
