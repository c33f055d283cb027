"""Command-line interface, flag-compatible with the reference.

Usage text mirrors usage() (Genrich.c:34-71); errors print
``Error! <msg>`` to stderr and exit 1 (error(), Genrich.c:78-81).
"""

from __future__ import annotations

import sys
from typing import List, Optional

from . import GENRICH_COMPAT_VERSION, __version__
from .errors import GenrichError
from .params import (DEFATAC, DEFAUC, DEFMAXGAP, DEFMINLEN, DEFPVAL,
                     UsageRequested, VersionRequested, parse_args)

USAGE = f"""Usage: genrich-tpu  -t <file>  -o <file>  [optional arguments]
Required arguments:
  -t  <file>       Input SAM/BAM file(s) for experimental sample(s)
  -o  <file>       Output peak file (in ENCODE narrowPeak format)
Optional I/O arguments:
  -c  <file>       Input SAM/BAM file(s) for control sample(s)
  -f  <file>       Output bedgraph-ish file for p/q values
  -k  <file>       Output bedgraph-ish file for pileups and p-values
  -b  <file>       Output BED file for reads/fragments/intervals
  -R  <file>       Output file for PCR duplicates (only with -r)
Filtering options:
  -r               Remove PCR duplicates
  -e  <arg>        Comma-separated list of chromosomes to exclude
  -E  <file>       Input BED file(s) of genomic regions to exclude
  -m  <int>        Minimum MAPQ to keep an alignment (def. 0)
  -s  <float>      Keep sec alns with AS >= bestAS - <float> (def. 0)
  -y               Keep unpaired alignments (def. false)
  -w  <int>        Keep unpaired alns, lengths changed to <int>
  -x               Keep unpaired alns, lengths changed to paired avg
Options for ATAC-seq:
  -j               Use ATAC-seq mode (def. false)
  -d  <int>        Expand cut sites to <int> bp (def. {DEFATAC})
  -D               Skip Tn5 adjustments of cut sites (def. false)
Options for peak-calling:
  -p  <float>      Maximum p-value (def. {float(DEFPVAL):.2f})
  -q  <float>      Maximum q-value (FDR-adjusted p-value; def. 1)
  -a  <float>      Minimum AUC for a peak (def. {float(DEFAUC):.1f})
  -l  <int>        Minimum length of a peak (def. {DEFMINLEN})
  -g  <int>        Maximum distance between signif. sites (def. {DEFMAXGAP})
Other options:
  -X               Skip peak-calling
  -P               Call peaks directly from a log file (-f)
  -z               Option to gzip-compress output(s)
  -v               Option to print status updates/counts to stderr
"""


def main(argv: Optional[List[str]] = None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if "--serve" in argv:
        # persistent-process mode (extension): one analysis per stdin
        # line, device engines and their compiled programs reused
        from .serve import serve_loop
        return serve_loop([a for a in argv if a != "--serve"])
    try:
        params = parse_args(argv)
    except UsageRequested:
        sys.stderr.write(USAGE)
        return 1
    except VersionRequested:
        sys.stderr.write(
            f"genrich-tpu, version {__version__} "
            f"(Genrich {GENRICH_COMPAT_VERSION} compatible)\n")
        return 1
    except GenrichError as e:
        sys.stderr.write(e.render() + "\n")
        return 1

    try:
        from .pipeline import run
        run(params)
    except GenrichError as e:
        sys.stderr.write(e.render() + "\n")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
