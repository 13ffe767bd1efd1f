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


def apply_input_defaults(block_id: str, static: dict[str, Any]) -> dict[str, Any]:
    """Schema defaults merged under the user's static input (the reference
    merges defaultBlockConfig ← userBlockConfig, e.g. block_wrap_text.go:
    60-63 MergeStructs)."""
    schema = BLOCK_INPUT_SCHEMAS.get(block_id)
    if not schema:
        return dict(static)
    out = {
        k: p["default"]
        for k, p in schema.get("properties", {}).items()
        if "default" in p
    }
    out.update(static)
    return out
