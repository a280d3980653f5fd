.PHONY: test oracle bench plans smoke

test:
	python -m pytest tests/ -x -q

oracle:
	python tools/check_oracle.py

oracle-fast:
	python tools/check_oracle.py /root/testdata/sf0.001

bench:
	python bench.py

plans:
	python tools/gen_plans.py

smoke:
	python -c "import sys; sys.path.insert(0,'.'); \
	import __spark_entry__ as m; \
	from docling_translate_spark.plans.session import build_session; \
	s = build_session(master='local[8]'); s.sparkContext.setLogLevel('ERROR'); \
	print('entry rows:', len(m.entry(s).collect())); s.stop()"
