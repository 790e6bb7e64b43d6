"""Custom operators: keyed mutations (upsert/delete), TFRecord, entities."""
