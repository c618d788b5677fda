from pngloss_tpu.cli import main

main()
