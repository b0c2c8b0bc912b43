"""File-format sources: schema-enforced JSONL/CSV readers with
corrupt-record DLQ routing (the reference's malformed-payload handling
at the source boundary)."""
