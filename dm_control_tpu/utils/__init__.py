"""Shared utilities (reference: dm_control/utils/)."""
