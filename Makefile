# Round gate targets (VERDICT r2 item 3): run `make preflight` before any
# end-of-round snapshot — it refuses (non-zero exit) on any driver-window
# oracle mismatch, test failure, or unparseable bench line.

.PHONY: gate test bench preflight

gate:
	python scripts/green_gate.py

test:
	python -m pytest tests/ -q

bench:
	python bench.py

preflight: gate test bench
