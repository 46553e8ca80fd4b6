"""Typed error hierarchy — mirrors the reference's error surface
(anyhow/thiserror messages in src/main.rs, src/polynomial.rs, src/curves.rs)
with Python exceptions.
"""

from __future__ import annotations


class KzgError(Exception):
    """Base error for the kzg_tpu framework."""


class SerializationError(KzgError):
    """Bad artifact bytes (length / flags / field-range / curve membership)."""


class ProtocolError(KzgError):
    """KZG protocol precondition failures (degree caps, non-root division, ...)."""


class CliError(KzgError):
    """Command execution failures (missing artifacts, bad inputs)."""
