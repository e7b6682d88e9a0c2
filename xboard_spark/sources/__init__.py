"""Source connectors: driver-side capture clients whose output feeds the
engine's distributed ingest scans (``ingest.ingest_entity_pages``)."""
