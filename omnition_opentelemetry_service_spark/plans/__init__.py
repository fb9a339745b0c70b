"""Pipeline plans: config → staged DataFrame DAG with checkpoint/resume
(the service.StartUnified analog, reference main.go:32-37)."""
