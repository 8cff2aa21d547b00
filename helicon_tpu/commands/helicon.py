"""Entry point for the ``helicon`` console command.

Reference: src/helicon/helicon.py — an argparse dispatcher that imports
helicon.commands.<name> per subcommand and wires add_args/main/check_args
(helicon.py:40-125). Web-app commands are skipped when shiny/streamlit
are unavailable (helicon.py:57-59).
"""

from __future__ import annotations

import argparse
import logging
import sys
from importlib import import_module

import helicon_tpu
from helicon_tpu.utils.exceptions import HeliconError, HeliconExit
from helicon_tpu.utils.system import available_cpu, has_shiny, has_streamlit

logger = logging.getLogger(__name__)

cli_commands = [
    "HOM_containerC",
    "cryosparc",
    "images2star",
    "proc3d",
    "symmetry_mismatch",
    "trueFSC",
    "denovo3d_cli",
]
shiny_commands = [
    "denovo3D",
    "helicalPitch",
    "helicalProjection",
    "whereIsMyClass",
]
streamlit_commands = [
    "ctfSimulation",
    "helicalLattice",
    "hi3d",
    "hill",
    "map2seq",
    "procart",
]


class HeliconArgumentParser(argparse.ArgumentParser):
    def error(self, message):
        self.exit(2, f"{self.prog}: error: {message}\n")


def _get_commands(cli_commands, shiny_commands, streamlit_commands, doc_str=""):
    parser = HeliconArgumentParser(description=doc_str, allow_abbrev=True)
    parser.add_argument(
        "--version", action="version", version="helicon " + helicon_tpu.__version__
    )
    subparsers = parser.add_subparsers(
        title="Choose a command", parser_class=HeliconArgumentParser
    )
    subparsers.required = True

    for module_name in sorted(cli_commands + shiny_commands + streamlit_commands):
        if module_name in shiny_commands and not has_shiny():
            continue
        if module_name in streamlit_commands and not has_streamlit():
            continue
        module = import_module(f"helicon_tpu.commands.{module_name}")
        if not hasattr(module, "add_args"):
            continue
        parsed_doc = module.__doc__.split("\n") if module.__doc__ else []
        descr = parsed_doc[0] if parsed_doc else ""
        epilog = "" if len(parsed_doc) <= 1 else "\n".join(parsed_doc[1:])
        this_parser = subparsers.add_parser(
            module_name, help=descr, description=descr, epilog=epilog,
            allow_abbrev=True,
        )
        module.add_args(this_parser)
        this_parser.set_defaults(
            main_function=module.main,
            this_parser=this_parser,
            check_args_function=getattr(module, "check_args", None),
        )

    try:
        args = parser.parse_args()
        if args.check_args_function is not None:
            args = args.check_args_function(args, args.this_parser)
    except SystemExit as e:
        if e.code not in (0, None):
            sub = sys.argv[1] if len(sys.argv) > 1 else None
            if sub and sub in subparsers.choices:
                subparsers.choices[sub].print_help()
            else:
                parser.print_usage()
            sys.exit(-1)
        raise
    except HeliconError as e:
        logger.error("ERROR: %s", e)
        sys.exit(1)

    try:
        args.main_function(args)
    except HeliconExit:
        sys.exit(0)
    except HeliconError as e:
        logger.error("ERROR: %s", e)
        sys.exit(1)
    except Exception as e:
        logger.error("UNEXPECTED ERROR: %s", e)
        import traceback

        traceback.print_exc()
        sys.exit(1)


def main():
    # The axon TPU plugin ignores JAX_PLATFORMS; honor our own env var so
    # metadata-only commands (and tests) can run without grabbing the chip.
    import os

    platform = os.environ.get("HELICON_PLATFORM", "")
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)
    _get_commands(
        cli_commands=cli_commands,
        shiny_commands=shiny_commands,
        streamlit_commands=streamlit_commands,
        doc_str="helicon-tpu: TPU-native cryo-EM analysis of helical structures",
    )


if __name__ == "__main__":
    main()
