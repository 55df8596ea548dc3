.PHONY: verify test gate gate-scale bench coverage

# The pre-submit gate: full unit suite + the sf0.01 oracle gate (the
# exact comparison the round driver runs, incl. the output-type canon
# audit). Run this before every round-closing commit — a red here is a
# red verdict the driver would have recorded.
verify: test gate

test:
	python -m pytest tests/ -x -q

gate:
	python tools/oracle_gate.py /root/testdata/sf0.01 2>&1 | tee tools/gate_last.log

# bench-scale correctness (10x the judged SF; slower, run per-round)
gate-scale:
	python tools/oracle_gate.py /root/testdata/sf0.1 2>&1 | tee tools/gate_scale_last.log

bench:
	python bench.py

coverage:
	python gen_coverage.py
