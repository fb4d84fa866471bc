package graft.store

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

import graft.store.Registration.{TaskResult, TaskStatus}

/** HTTP-backed `statusOf` for [[Registration.pollAndRegister]] — the actual
  * cross-workspace transport the reference's registration notebook drives
  * its poll loop over (`feature_store_register.py:484-570` polls a remote
  * jobs API for run state). The poll/registration LOGIC is transport-free
  * (injected `statusOf`); this client is the production wiring: one
  * `java.net.http.HttpClient` (JDK-native, zero extra jars), GET
  * `{base}/targets/{target}/tasks/{task}/status`, and a deliberately strict
  * mapping of the remote life-cycle vocabulary onto [[TaskStatus]].
  *
  * Response contract (mirrors the reference's `life_cycle_state` /
  * `result_state` pair): a tiny JSON body
  * `{"life_cycle_state": "...", "result_state": "...", "message": "..."}`.
  * PENDING/RUNNING map to their [[TaskStatus]] peers; TERMINATED resolves
  * through result_state (SUCCESS / CANCELED / anything else = Failed with
  * the message). Unknown states and non-200 responses THROW — a poll loop
  * that misreads a state machine retires tasks incorrectly, so unknowns
  * fail fast rather than default.
  *
  * The body is parsed with an anchored regex per field instead of a JSON
  * library (the build has none); the fields are flat strings by contract,
  * so this is exact, not heuristic.
  *
  * Scale/ops note: polling is DRIVER-side control flow (k tasks, one GET
  * per live task per sweep) — never on the data path. Timeouts bound a
  * hung remote; retries belong to the caller's sweep cadence (the loop
  * revisits non-terminal tasks anyway).
  */
class HttpStatusClient(baseUrl: String,
                       timeout: Duration = Duration.ofSeconds(10)) {

  private val client: HttpClient =
    HttpClient.newBuilder().connectTimeout(timeout).build()

  private def field(body: String, name: String): Option[String] = {
    val m = ("\"" + java.util.regex.Pattern.quote(name) +
      "\"\\s*:\\s*\"([^\"]*)\"").r
    m.findFirstMatchIn(body).map(_.group(1))
  }

  /** GET the task's status document; throws on transport errors, non-200,
    * or an unknown state string. */
  def statusOf(target: String, task: String): TaskStatus = {
    val uri = URI.create(
      s"${baseUrl.stripSuffix("/")}/targets/$target/tasks/$task/status")
    val resp = client.send(
      HttpRequest.newBuilder(uri).timeout(timeout).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    require(resp.statusCode() == 200,
      s"status endpoint $uri returned HTTP ${resp.statusCode()}")
    val body = resp.body()
    // Locale.ROOT: under e.g. a Turkish default locale "running".toUpperCase
    // is "RUNNİNG" (dotted İ) and every valid state would fail the match
    field(body, "life_cycle_state")
      .map(_.toUpperCase(java.util.Locale.ROOT)) match {
      case Some("PENDING") => TaskStatus.Pending
      case Some("RUNNING") => TaskStatus.Running
      case Some("TERMINATED") =>
        field(body, "result_state")
          .map(_.toUpperCase(java.util.Locale.ROOT)) match {
          case Some("SUCCESS") => TaskStatus.Terminated(TaskResult.Success)
          case Some("CANCELED") => TaskStatus.Terminated(TaskResult.Canceled)
          case Some(other) => TaskStatus.Terminated(TaskResult.Failed(
            field(body, "message").getOrElse(other)))
          case None => throw new IllegalStateException(
            s"TERMINATED status without result_state from $uri: $body")
        }
      case Some(other) => throw new IllegalStateException(
        s"unknown life_cycle_state '$other' from $uri")
      case None => throw new IllegalStateException(
        s"no life_cycle_state in response from $uri: $body")
    }
  }
}
