#!/bin/sh
# External-validation container entry (reference role: the dockerfile CMD
# driving scripts/external_validation.py from EXTERNAL_VALIDATION_DATA_PATH).
# DEEPCORO_MODE=serve starts the online inference server instead
# (scripts/serve.py: micro-batched per-study retrieval over HTTP).
set -eu

if [ "${DEEPCORO_MODE:-validate}" = "serve" ]; then
    # DEEPCORO_ARTIFACT: serve a frozen jax.export program directory
    # (scripts/export_model.py) instead of rebuilding the model stack
    exec python scripts/serve.py \
        ${DEEPCORO_ARTIFACT:+--artifact "${DEEPCORO_ARTIFACT}"} \
        ${DEEPCORO_CHECKPOINT:+--checkpoint "${DEEPCORO_CHECKPOINT}"} \
        ${DEEPCORO_TEXT_BANK:+--text_bank "${DEEPCORO_TEXT_BANK}"} \
        --host 0.0.0.0 --port "${DEEPCORO_PORT:-8080}" "$@"
fi

: "${EXTERNAL_VALIDATION_DATA_PATH:?set EXTERNAL_VALIDATION_DATA_PATH to the input CSV}"
: "${DEEPCORO_BASE_CONFIG:=config/linear_probing/stenosis_config.yaml}"
: "${DEEPCORO_CHECKPOINT:=}"
: "${DEEPCORO_OUTPUT_DIR:=/workspace/results}"

extra=""
if [ -n "${DEEPCORO_CHECKPOINT}" ]; then
    extra="--checkpoint ${DEEPCORO_CHECKPOINT}"
fi
if [ -n "${DEEPCORO_FILTER_CONFIG:-}" ]; then
    extra="${extra} --filter_config ${DEEPCORO_FILTER_CONFIG}"
fi
if [ -n "${DEEPCORO_FILTER_CHECKPOINT:-}" ]; then
    extra="${extra} --filter_checkpoint ${DEEPCORO_FILTER_CHECKPOINT}"
fi

exec python scripts/external_validation.py \
    --input_csv "${EXTERNAL_VALIDATION_DATA_PATH}" \
    --base_config "${DEEPCORO_BASE_CONFIG}" \
    --output_dir "${DEEPCORO_OUTPUT_DIR}" \
    ${extra} "$@"
