"""Run state: broadcast helpers and checkpoint manifests."""
