from .ingest import extract_frames, extract_cavp_features
