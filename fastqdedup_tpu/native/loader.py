"""ctypes loader for the native FASTQ chunk parser (built lazily).

The shared library is compiled from ``_fastq_io.c`` by
``fastqdedup_tpu.native.build`` (invoked by setup.py or on demand).  Until
it exists, importing ``read_fastq_chunks_native`` raises ImportError so the
pure-Python path is used.
"""

raise ImportError("native FASTQ parser not built yet")
