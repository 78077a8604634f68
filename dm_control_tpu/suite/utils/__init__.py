"""Suite utilities (reference: dm_control/suite/utils/)."""
