"""Training entry points: SCONE pretrainers and the MACARONS online trainer."""
