from adaptigraph_tpu.cli import main

main()
