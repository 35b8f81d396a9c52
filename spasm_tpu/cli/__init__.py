"""Command-line tools mirroring the reference's tools/ directory:

  python -m spasm_tpu.cli.rank          rank (tools/rank.c)
  python -m spasm_tpu.cli.echelonize    U / RREF output (tools/echelonize.c)
  python -m spasm_tpu.cli.kernel        kernel basis (tools/kernel.c)
  python -m spasm_tpu.cli.solve         XA == B (tools/solve.c)
  python -m spasm_tpu.cli.dm            Dulmage-Mendelsohn (tools/dm.c)
  python -m spasm_tpu.cli.check_cert    verify rank certificate
  python -m spasm_tpu.cli.stack         drop empty rows/cols (tools/stack.c)
  python -m spasm_tpu.cli.vertical_swap mirror columns
  python -m spasm_tpu.cli.transpose     transpose filter
  python -m spasm_tpu.cli.bitmap        PBM/PGM density image

All tools are Unix filters: SMS/MatrixMarket on stdin (or --matrix FILE),
result on stdout, logs on stderr — same conventions as the reference.
"""
