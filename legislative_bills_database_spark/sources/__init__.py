"""Ingestion layer: REST client, document-model loaders, text extraction,
multimodal binary columns, incremental manifests, CSV sinks.

HTTP stays on the driver (rate-limited, retried); everything downstream of
the first parquet/JSON landing zone is executor-side.
"""
