package graft.sinks

/**
 * B48 — pluggable container runtime for IMAGE-packaged connectors: turns a
 * `package.image` declaration into a stdio-speaking child process via the
 * container CLI (`docker run -i`), graft's counterpart of the reference's
 * dockerode-driven `DockerContainer` (core/src/docker/container.ts:166-247;
 * studied, not ported). The attach-over-socket plumbing the reference
 * needs (dockerode + the modem workaround, container.ts:283-299) collapses
 * to nothing here: `docker run -i` IS an attached stdio stream, so the
 * same [[graft.protocol.StdioConnector]] drives both package flavors and a
 * reference connector image runs unchanged.
 *
 * Reference semantics carried over:
 *  - pull policy (container.ts:188-195): try `pull` first, fall back to
 *    the local image on failure — `pullPolicy = "always"`; `"never"`
 *    skips the pull (tests, air-gapped clusters).
 *  - env injection (ContainerCreate `Env`, container.ts:199-210): every
 *    config env var rides a bare `-e K` passthrough flag with the value
 *    set in the docker CLI's own environment (deliberate divergence from
 *    the reference's in-argv values: argv is world-readable via
 *    /proc/<pid>/cmdline), including the engine-supplied `RPC_URL` state
 *    side-channel.
 *  - host gateway (`ExtraHosts: host.docker.internal:host-gateway`,
 *    container.ts:206-208): the in-container `RPC_URL` names
 *    [[rpcHost]] (default `host.docker.internal`), and the engine binds
 *    the RPC server on all interfaces so the container can reach it.
 *  - unique container name + remove-on-exit (`--rm` ≙ container.ts
 *    close() stop+remove, the `syncmaven-<timestamp>` name convention).
 *
 * `binary` is the pluggable part: production uses `docker` (or `podman`,
 * flag-compatible for this subset); specs substitute a shim script that
 * records the pull and execs a local connector process — the protocol
 * traffic is identical either way.
 *
 * Scale note: the runtime is an inert, serializable recipe — each
 * executor task materializes its own container lane
 * ([[ProcessSink.deliver]] spawns one per non-empty partition), so image
 * delivery scales exactly like command delivery; the only per-lane
 * overhead is the container start and the (cached-after-first) image pull
 * on each executor host.
 */
final case class ContainerRuntime(
    binary: String = "docker",
    pullPolicy: String = "always",
    rpcHost: String = "host.docker.internal",
    extraArgs: Seq[String] = Nil) {

  require(pullPolicy == "always" || pullPolicy == "never",
    s"unknown pullPolicy '$pullPolicy' (always|never)")

  /** Try-pull-with-local-fallback (container.ts:188-195): a failed pull is
    * reported through `onLog` and the run proceeds against the local
    * image — exactly the reference's behavior on registry outages. */
  def ensureImage(image: String, onLog: String => Unit = _ => ()): Unit =
    if (pullPolicy == "always") {
      try {
        val p = new ProcessBuilder((Seq(binary, "pull", image)): _*)
          .redirectErrorStream(true).start()
        val tail = new String(p.getInputStream.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8).takeRight(500)
        val code = p.waitFor()
        if (code != 0)
          onLog(s"Failed to pull image $image (exit $code): $tail — trying with local one.")
      } catch {
        case e: Exception =>
          onLog(s"Failed to pull image $image: ${e.getMessage} — trying with local one.")
      }
    }

  /** The `docker run` line for one connector lane — the CLI spelling of
    * the reference's ContainerCreate options (container.ts:199-217):
    * attached stdio (`-i`), host gateway alias, env as BARE `-e K` flags
    * (sorted for determinism), a unique name, remove-on-exit.
    *
    * The `-e` flags are deliberately value-free: `docker run -e K`
    * forwards K's value from the docker CLI's OWN process environment, so
    * the caller must launch this argv with the env map applied via
    * `ProcessBuilder.environment()` (StdioConnector does). Spelling
    * `-e K=V` here would put connector credentials and the per-lane
    * StateRpc capability token into argv, which is world-readable through
    * /proc/<pid>/cmdline on every executor host — the env-passthrough
    * form keeps secrets out of the process table entirely. */
  def launchCommand(image: String, env: Map[String, String]): Seq[String] = {
    val name = "graft-" + image.replaceAll("[^A-Za-z0-9_.-]", "-") + "-" +
      java.lang.Long.toHexString(System.nanoTime())
    Seq(binary, "run", "-i", "--rm",
      "--add-host", "host.docker.internal:host-gateway",
      "--name", name) ++
      env.keys.toSeq.sorted.flatMap(k => Seq("-e", k)) ++
      extraArgs :+ image
  }
}
