"""Sources: testdata parquet loaders + parse branches per wire format
(the receiver registry analog, cmd/omnitelsvc/components.go:39-77)."""
