"""Logging/env configuration — same semantics as the reference CLI
(src/main.rs:53-75): `-d` count maps 0->INFO, 1->DEBUG, 2+->TRACE; a
`LOG_LEVEL` entry in the environment or a local `.env` file overrides
(invalid values fall back to the -d default). TRACE maps to a custom level
below DEBUG.
"""

from __future__ import annotations

import logging
import os

TRACE = 5
logging.addLevelName(TRACE, "TRACE")

_LEVELS = {
    "TRACE": TRACE,
    "DEBUG": logging.DEBUG,
    "INFO": logging.INFO,
    "WARN": logging.WARNING,
    "WARNING": logging.WARNING,
    "ERROR": logging.ERROR,
}


def load_dotenv(path: str = ".env") -> dict[str, str]:
    """Minimal .env parser (the reference uses dotenvy, src/main.rs:62-66);
    does not override variables already set in the process environment."""
    out = {}
    if not os.path.exists(path):
        return out
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#") or "=" not in line:
                continue
            k, v = line.split("=", 1)
            k, v = k.strip(), v.strip().strip("'\"")
            out[k] = v
            if k not in os.environ:
                os.environ[k] = v
    return out


def init_logging(debug_count: int = 0) -> int:
    """Initialize root logging; returns the numeric level that was set."""
    default = {0: logging.INFO, 1: logging.DEBUG}.get(debug_count, TRACE)
    load_dotenv()
    env = os.environ.get("LOG_LEVEL")
    level = _LEVELS.get(env.upper(), default) if env else default
    logging.basicConfig(
        level=level,
        format="%(asctime)s %(levelname)s [%(name)s] %(message)s",
        datefmt="%Y-%m-%dT%H:%M:%S",
        force=True,
    )
    return level
