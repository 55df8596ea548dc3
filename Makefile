.PHONY: verify test gate gate-scale gate-adv advdata bench coverage

# The pre-submit gate: full unit suite + the sf0.01 oracle gate (the
# exact comparison the round driver runs, incl. the output-type canon
# audit) + the adversarial NULL-seeded/48-dim gate. Run this before
# every round-closing commit — a red here is a red verdict the driver
# would have recorded.
verify: test gate gate-adv

test:
	python -m pytest tests/ -x -q

gate:
	python tools/oracle_gate.py /root/testdata/sf0.01 2>&1 | tee tools/gate_last.log

# bench-scale correctness (10x the judged SF; slower, run per-round)
gate-scale:
	python tools/oracle_gate.py /root/testdata/sf0.1 2>&1 | tee tools/gate_scale_last.log

# adversarial fixtures: sf0.001 with ~5% NULLs in every nullable
# analytics column and 48-dim embeddings — the latent NULL-ordering /
# hardcoded-dim divergence killer (deterministic; regenerating is cheap)
advdata:
	python tools/make_adversarial_fixtures.py

gate-adv: advdata
	python tools/oracle_gate.py tools/advdata/sf0.001adv-d48 2>&1 | tee tools/gate_adv_last.log

# wider-than-trained dimension variant (mirror-extended 96-dim
# embeddings); run when touching embedding/similarity operators
gate-adv96:
	ADV_DIM=96 python tools/make_adversarial_fixtures.py
	python tools/oracle_gate.py tools/advdata/sf0.001adv-d96 2>&1 | tee tools/gate_adv96_last.log

bench:
	python bench.py

coverage:
	python gen_coverage.py

# deep NULL-fuzz pass (25 hypothesis examples per query instead of 5);
# optionally narrow with K="-k <expr>"
deepfuzz:
	SHSS_FUZZ_EXAMPLES=25 python -m pytest tests/test_null_fuzz.py -q $(K)

# regenerate the driver-verdict ledger from CORRECTNESS_r*.json
# (tests fail when it is stale)
verified:
	python tools/gen_verified.py --write
