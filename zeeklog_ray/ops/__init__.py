"""Extended large-scale training-data operators (beyond the reference's
Zeek inventory): deduplication, similarity search, text analysis,
sessionization / temporal joins, multimodal column plumbing."""
