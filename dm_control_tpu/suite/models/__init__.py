"""Generated model literal trees for the suite domains (models-as-code)."""
