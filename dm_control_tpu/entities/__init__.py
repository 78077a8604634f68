"""Entities (reference: dm_control/entities/)."""
