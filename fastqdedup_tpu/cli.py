"""Command-line interface.

Exact flag surface of the reference
(/root/reference/src/fastqdedup/__init__.py:305-412): positional FASTQ files,
-l/--check-lengths, -o/--output (repeatable), -p/--prefix, -d/--max-distance,
-e/--max-average-error-rate, -E, --edit, -c/--cluster-dissection-method,
-v/-q verbosity stacking — so reference invocations work unchanged.
"""

import argparse
import contextlib
import logging
import os
import resource

from .dissect import CLUSTER_DISSECTION_METHODS
from .keys import length_string_to_slices
from .pipeline import (
    DEFAULT_MAX_AVERAGE_ERROR_RATE,
    DEFAULT_MAX_DISTANCE,
    deduplicate_cluster,
)
from .utils.timing import Timer

DEFAULT_PREFIX = "fastqdedup_R"
DEFAULT_CLUSTER_DISSECTION = "directional"


def initiate_logger(verbose: int = 0, quiet: int = 0) -> None:
    log_level = logging.INFO - 10 * (verbose - quiet)
    logger = logging.getLogger("fastqdedup")
    logger.setLevel(log_level)
    console_handler = logging.StreamHandler()
    console_handler.setLevel(log_level)
    formatter = logging.Formatter(
        "{asctime}:{levelname}:{name}: {message}",
        datefmt="%m/%d/%Y %I:%M:%S",
        style="{")
    console_handler.setFormatter(formatter)
    logger.addHandler(console_handler)


def argument_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "fastq", metavar="FASTQ", nargs="+",
        help="Forward FASTQ and optional reverse and UMI FASTQ files.")
    parser.add_argument(
        "-l", "--check-lengths",
        help="Comma-separated string with the maximum string check length of "
             "each file. For example "
             "'fastqdedup --check-lengths 16,8 R1.fastq R2.fastq' only "
             "checks the first 16 bases of R1 and the first 8 bases of R2 "
             "for duplication. Supports slice notation such as '4:8' or "
             "'::8'.")
    parser.add_argument(
        "-o", "--output", action="append", required=False,
        help="Output file (optional), must be specified multiple times for "
             "multiple input files. For example ``fastqdedup -o dedupR1.fastq"
             " -o dedupR2.fastq R1.fastq R2.fastq``.")
    parser.add_argument(
        "-p", "--prefix", default=DEFAULT_PREFIX,
        help=f"Prefix for the output files. Default: '{DEFAULT_PREFIX}'")
    parser.add_argument(
        "-d", "--max-distance", type=int, default=DEFAULT_MAX_DISTANCE,
        help="The Hamming distance at which inputs are considered "
             f"different. Default: {DEFAULT_MAX_DISTANCE}.")
    parser.add_argument(
        "-e", "--max-average-error-rate", type=float,
        default=DEFAULT_MAX_AVERAGE_ERROR_RATE,
        help="The maximum average per base error rate for each FASTQ "
             "record. Average is evaluated over bases taken into account by "
             "--check-lengths."
             f"Default: {DEFAULT_MAX_AVERAGE_ERROR_RATE}")
    parser.add_argument(
        "-E", "--no-average-error-rate-filter", action="store_const",
        dest="max_average_error_rate", const=1.0,
        help="Do not filter on average per base error rate.")
    parser.add_argument(
        "--edit", action="store_true",
        help="Use edit (Levenshtein) distance instead of Hamming distance.")
    parser.add_argument(
        "-c", "--cluster-dissection-method",
        choices=CLUSTER_DISSECTION_METHODS.keys(),
        default=DEFAULT_CLUSTER_DISSECTION,
        help="How to approach clusters with multiple reads. "
             "'highest_count' selects only one read, the one with the "
             "highest count. "
             "'adjacency' starts from the read with the highest count and "
             "selects all reads that are within the specified distance. "
             "The process is repeated for the remaining reads. "
             "'directional' is similar to adjacency but uses counts to "
             "determine if an error is a PCR/sequencing artifact or derived "
             "from a difference in the molecule (default).")
    parser.add_argument("-v", "--verbose", action="count", default=0,
                        help="Increase log verbosity.")
    parser.add_argument("-q", "--quiet", action="count", default=0,
                        help="Reduce log verbosity.")
    return parser


@contextlib.contextmanager
def _maybe_profile():
    """Capture a jax.profiler trace when FASTQDEDUP_PROFILE=<dir> is set
    (device timelines + host annotations; open with TensorBoard or
    xprof).  The reference's only observability was coarse phase timers
    (__init__.py:42-51); those still log at INFO."""
    trace_dir = os.environ.get("FASTQDEDUP_PROFILE")
    if not trace_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logging.getLogger("fastqdedup").info(
            f"Wrote jax profiler trace to {trace_dir}")


def main() -> None:
    args = argument_parser().parse_args()
    initiate_logger(args.verbose, args.quiet)
    logger = logging.getLogger("fastqdedup")

    input_files = args.fastq
    check_slices = (length_string_to_slices(args.check_lengths)
                    if args.check_lengths else None)
    output_files = args.output or [
        args.prefix + str(x) + ".fastq.gz"
        for x in range(1, len(input_files) + 1)]
    cluster_dissection_func = CLUSTER_DISSECTION_METHODS[
        args.cluster_dissection_method]
    distance_name = "Levenshtein" if args.edit else "Hamming"
    timer = Timer()
    logger.info(f"Input files: {', '.join(input_files)}")
    logger.info(f"Output files: {', '.join(output_files)}")
    logger.info(f"Check lengths: {args.check_lengths}")
    logger.info(f"Maximum {distance_name} distance: {args.max_distance}")
    logger.info(f"Maximum average error rate: {args.max_average_error_rate}")
    logger.info(f"Cluster dissection method: "
                f"{args.cluster_dissection_method}")
    with _maybe_profile():
        deduplicate_cluster(input_files, output_files, check_slices,
                            args.max_distance, args.max_average_error_rate,
                            cluster_dissection_func, args.edit)
    resources = resource.getrusage(resource.RUSAGE_SELF)
    logger.info(f"Finished. Total time: {timer.get_difference()}. "
                f"Memory usage: {resources.ru_maxrss / (1024 ** 2):.2} GiB")
