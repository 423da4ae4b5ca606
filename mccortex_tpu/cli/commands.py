"""Subcommand registrations (filled in as tools are implemented)."""

from .main import register  # noqa: F401
