"""Replica-router CLI: front N per-chip `cli.serve` replicas with one
least-loaded, health-ejecting HTTP endpoint (the default v5e-8 throughput
deploy — docs/DESIGN.md "Serving on a mesh: TP vs per-chip replicas").

Usage:
  python -m llm_speech_summarization_tpu.cli.route \
      --backends http://10.0.0.1:8080,http://10.0.0.2:8080 --port 8000
"""

from ..serve.router import main

if __name__ == "__main__":
    main()
